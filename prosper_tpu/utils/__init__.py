from .logger import log_info, log_warn, log_error
from .timer import Timer

"""Logging, equivalent of the reference's fmt-macro logger.

Reference: /root/reference/src/utils/Logger.hpp:39-48 (LOG_INFO/WARN/ERR).
"""

from __future__ import annotations

import logging
import sys

_logger = logging.getLogger("prosper_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(logging.Formatter("[%(levelname).1s] %(message)s"))
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)


def log_info(msg: str, *args) -> None:
    _logger.info(msg, *args)


def log_warn(msg: str, *args) -> None:
    _logger.warning(msg, *args)


def log_error(msg: str, *args) -> None:
    _logger.error(msg, *args)

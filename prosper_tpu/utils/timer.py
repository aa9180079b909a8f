"""Wall-clock timer, equivalent of the reference's chrono Timer.

Reference: /root/reference/src/utils/Timer.hpp.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()

    def get_seconds(self) -> float:
        return time.perf_counter() - self._start

    def get_millis(self) -> float:
        return self.get_seconds() * 1e3

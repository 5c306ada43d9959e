"""Level-gated global logger with callback interception.

Reference: Sources/ArgmaxCore/Logging.swift:20-219 — singleton logger with
LogLevel{debug,info,error,none}, an optional logging callback that intercepts
all messages, and memory/timing helpers.
"""

from __future__ import annotations

import enum
import resource
import sys
import threading
import time
from typing import Callable, Optional


class LogLevel(enum.IntEnum):
    DEBUG = 0
    INFO = 1
    ERROR = 2
    NONE = 3


class _Logging:
    """Process-global logger (thread-safe, like the reference's Sendable singleton)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.level: LogLevel = LogLevel.INFO
        self.callback: Optional[Callable[[str], None]] = None

    def _emit(self, level: LogLevel, *args: object) -> None:
        with self._lock:
            if level < self.level:
                return
            cb = self.callback
        msg = " ".join(str(a) for a in args)
        if cb is not None:
            cb(msg)
        else:
            print(msg, file=sys.stderr)

    def debug(self, *args: object) -> None:
        self._emit(LogLevel.DEBUG, *args)

    def info(self, *args: object) -> None:
        self._emit(LogLevel.INFO, *args)

    def error(self, *args: object) -> None:
        self._emit(LogLevel.ERROR, *args)


logging = _Logging()


def log_current_memory_usage(label: str) -> None:
    """Reference: Logging.swift:179-200 `logCurrentMemoryUsage`."""
    usage_mb = current_memory_usage_mb()
    logging.debug(f"{label} - Memory usage: {usage_mb:.1f} MB")


def current_memory_usage_mb() -> float:
    # ru_maxrss is KiB on Linux.
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def format_time_with_percentage(time_s: float, runs: float, full_pipeline_s: float) -> str:
    """Reference: Logging.swift `formatTimeWithPercentage` — used by timing reports."""
    per_run = time_s / runs if runs > 0 else 0.0
    pct = (time_s / full_pipeline_s * 100.0) if full_pipeline_s > 0 else 0.0
    return f"{time_s * 1000:9.2f} ms / {int(runs):4d} runs ({per_run * 1000:9.2f} ms/run) {pct:5.2f}%"


class Timer:
    """Context-manager stopwatch used throughout the pipelines."""

    def __init__(self) -> None:
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc: object) -> None:
        self.elapsed = time.perf_counter() - self._start

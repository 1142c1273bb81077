"""Bounded ring-buffer logger — reference parity C7.

The reference keeps the last N log entries in a ring with callback fanout
and exposes them to polling clients (logger/logger.go:39-108 ``Logger``
with ``maxEntries`` trim at :102-104, ``AddCallback`` :228-232,
``GetEntries``/``GetRecentEntries`` :190-225; C ABI ``GetLogsC``
c_bindings/c_bindings.go:65-68). This is the driver-side re-expression:
entries never grow past ``capacity`` (oldest evicted), subscribers get
every entry synchronously (driver callbacks are cheap; the reference's
goroutine fanout buys nothing under the GIL), and ``get_logs``/
``get_logs_json`` are the polling surface.

Pure driver-side state: executors never log here (their stdout/stderr is
Spark's own log surface); the pipeline logs phase lifecycle events, so the
buffer stays small and useful at any scale.
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque

LEVELS = ("DEBUG", "INFO", "WARN", "ERROR", "FATAL")


class RingLogger:
    """Last-``capacity`` log entries + callback fanout (logger.go:39-108)."""

    def __init__(self, capacity: int = 1000):
        self._entries: deque[dict] = deque(maxlen=capacity)
        self._callbacks: list = []
        self._lock = threading.RLock()

    @property
    def capacity(self) -> int:
        return self._entries.maxlen or 0

    def subscribe(self, cb) -> None:
        """cb(entry: dict) — called synchronously per entry
        (AddCallback, logger.go:228-232)."""
        with self._lock:
            self._callbacks.append(cb)

    def log(self, level: str, message: str, context: str = "",
            data=None) -> dict:
        if level not in LEVELS:
            level = "INFO"
        entry = {
            "timestamp": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
            "level": level,
            "message": message,
        }
        if context:
            entry["context"] = context
        if data is not None:
            entry["data"] = data
        with self._lock:
            self._entries.append(entry)  # deque(maxlen) evicts the oldest
            callbacks = list(self._callbacks)
        for cb in callbacks:
            cb(entry)
        return entry

    def debug(self, message: str, context: str = "") -> dict:
        return self.log("DEBUG", message, context)

    def info(self, message: str, context: str = "", data=None) -> dict:
        return self.log("INFO", message, context, data)

    def warn(self, message: str, context: str = "") -> dict:
        return self.log("WARN", message, context)

    def error(self, message: str, context: str = "", data=None) -> dict:
        return self.log("ERROR", message, context, data)

    def get_logs(self, n: int | None = None) -> list[dict]:
        """Last ``n`` entries (all when n is None) — GetEntries /
        GetRecentEntries (logger.go:190-225); always a copy."""
        with self._lock:
            entries = list(self._entries)
        if n is None or n >= len(entries):
            return entries
        return entries[-n:] if n > 0 else []

    def get_logs_json(self, n: int | None = None) -> str:
        """GetEntriesJSON / GetLogsC analogue (c_bindings.go:65-68)."""
        return json.dumps(self.get_logs(n))

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()


_GLOBAL_LOGGER: RingLogger | None = None
_GLOBAL_LOCK = threading.Lock()


def get_logger() -> RingLogger:
    """Process-wide singleton (GetLogger, logger.go:52-58)."""
    global _GLOBAL_LOGGER
    with _GLOBAL_LOCK:
        if _GLOBAL_LOGGER is None:
            _GLOBAL_LOGGER = RingLogger(1000)
        return _GLOBAL_LOGGER

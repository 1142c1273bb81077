"""Cooperative cancellation + live progress — reference parity C5/C6.

The reference threads a cancellable context through every phase
(phase_5.go:17-37) and checks it between phases (run_finder.go:45, 52, 59,
66, 73, 79), and fans progress callbacks out per phase with percentages
(status/status.go:55-81, phase_2.go:54). The Spark re-expression:

* ``CancelToken`` — ``cancel()`` flips a flag AND cancels the running
  phase's Spark job group (``sc.cancelJobGroup`` with interrupt-on-cancel,
  so in-flight tasks die, not just future ones). ``run_pipeline`` checks
  the token at every phase boundary and raises ``PipelineCancelled``; a
  later run resumes from the completed checkpoints (the reference cannot —
  its cancel just aborts, SURVEY.md §2 C5).
* ``ProgressReporter`` — callback fanout with (phase, index/total percent,
  rows, seconds, resumed). Subscribers are driver-side listeners (a CLI
  printer, a metrics pusher); events are also retained on the reporter for
  post-hoc inspection, superseding round 1's write-only metrics rows.
"""

from __future__ import annotations

import threading


class PipelineCancelled(RuntimeError):
    """Raised at the first phase boundary after CancelToken.cancel()."""


class CancelToken:
    def __init__(self, spark):
        self._spark = spark
        self._cancelled = threading.Event()
        self._lock = threading.Lock()
        self._active_group: str | None = None

    def enter_phase(self, phase: str) -> None:
        """Tag all jobs of this phase with a cancellable group (driver
        thread only — Spark job groups are per-thread)."""
        with self._lock:
            self._active_group = phase
        self._spark.sparkContext.setJobGroup(
            phase, f"fdf phase {phase}", interruptOnCancel=True
        )

    def cancel(self) -> None:
        """Callable from any thread: stop the running phase's jobs now;
        the driver loop raises PipelineCancelled at the next boundary."""
        self._cancelled.set()
        with self._lock:
            group = self._active_group
        if group is not None:
            try:
                self._spark.sparkContext.cancelJobGroup(group)
            except Exception:  # noqa: BLE001 — racing a stopping context
                pass

    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()

    def check(self) -> None:
        if self._cancelled.is_set():
            raise PipelineCancelled("pipeline cancelled")


class ProgressReporter:
    """Callback fanout + bounded event history. ``max_events`` bounds the
    retained history the same way the reference's ring logger bounds its
    entries (logger/logger.go:102-104) — a week-long streaming run must
    not grow driver memory per phase. ``logger``: an optional
    plans.logging.RingLogger that phase lifecycle lines are mirrored into
    (the C7 log surface)."""

    def __init__(self, max_events: int = 1000, logger=None):
        from collections import deque

        self.callbacks: list = []
        self._events: deque[dict] = deque(maxlen=max_events)
        self.logger = logger

    @property
    def events(self) -> list[dict]:
        return list(self._events)

    def subscribe(self, cb) -> None:
        """cb(event: dict) — called on the driver at phase start/done."""
        self.callbacks.append(cb)

    def _emit(self, event: dict) -> None:
        self._events.append(event)  # deque(maxlen) evicts the oldest
        if self.logger is not None:
            self.logger.info(
                f"phase {event['phase']} {event['status']} "
                f"({event['percent']}%)",
                context="pipeline",
                data={k: v for k, v in event.items() if k != "phase"},
            )
        for cb in self.callbacks:
            cb(event)

    def phase_start(self, phase: str, index: int, total: int) -> None:
        self._emit(
            {
                "phase": phase,
                "status": "start",
                "index": index,
                "total": total,
                "percent": round(100.0 * (index - 1) / total, 1),
            }
        )

    def phase_done(self, phase: str, index: int, total: int, metric: dict
                   ) -> None:
        from fast_duplicate_finder_spark.functions.format import format_elapsed

        secs = metric.get("seconds")
        self._emit(
            {
                "phase": phase,
                "status": "resumed" if metric.get("resumed") else "done",
                "index": index,
                "total": total,
                "percent": round(100.0 * index / total, 1),
                "rows": metric.get("rows"),
                "seconds": secs,
                "elapsed": format_elapsed(secs) if secs is not None else None,
            }
        )

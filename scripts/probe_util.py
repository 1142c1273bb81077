"""Shared host-sampling + Spark-UI-REST instrumentation for the probe
scripts (p6_probe, p7_probe, scaling_leg).

One copy of the /proc/stat parsing and the stages/taskSummary scraping:
the three scripts previously carried diverging copies, so a fix to either
had to be applied three times or the probes silently disagreed.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.request


def cpu_sample() -> tuple[int, int]:
    """(busy_jiffies, total_jiffies) across all host CPUs."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals) - idle, sum(vals)


class BusyCores:
    """Average + peak host busy cores over the guarded block (1 Hz)."""

    def __enter__(self):
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._last = cpu_sample()

        def poll():
            while not self._stop.wait(1.0):
                cur = cpu_sample()
                db = cur[0] - self._last[0]
                dt = cur[1] - self._last[1]
                self._last = cur
                if dt > 0:
                    self.samples.append(db / dt * os.cpu_count())

        self._t = threading.Thread(target=poll, daemon=True)
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()

    @property
    def avg(self) -> float:
        return round(sum(self.samples) / max(len(self.samples), 1), 1)

    @property
    def peak(self) -> float:
        return round(max(self.samples, default=0.0), 1)


class StageProbe:
    """Times a step, samples busy cores, and attributes the step's NEW
    completed Spark stages with per-stage task-duration quantiles from the
    UI REST API (needs ``spark.ui.enabled=true``).

    ``min_run_ms`` drops sub-threshold stages from the report (p7's
    usage); 0 keeps everything (p6's usage).
    """

    def __init__(self, spark, min_run_ms: int = 0):
        self.ui = spark.sparkContext.uiWebUrl
        self.app_id = spark.sparkContext.applicationId
        self.min_run_ms = min_run_ms

    def snapshot(self) -> dict:
        try:
            with urllib.request.urlopen(
                f"{self.ui}/api/v1/applications/{self.app_id}"
                "/stages?status=complete"
            ) as r:
                return {s["stageId"]: s for s in json.load(r)}
        except Exception:
            return {}

    def _task_quantiles(self, sid: int, attempt: int) -> list[float]:
        try:
            with urllib.request.urlopen(
                f"{self.ui}/api/v1/applications/{self.app_id}/stages/{sid}/"
                f"{attempt}/taskSummary?quantiles=0,0.5,1.0"
            ) as r:
                q = json.load(r)
            return [round(x / 1000.0, 1) for x in q["duration"]]
        except Exception:
            return []

    def step(self, name: str, fn, out: dict) -> None:
        before = self.snapshot()
        with BusyCores() as bc:
            t0 = time.perf_counter()
            res = fn()
            dt = time.perf_counter() - t0
        after = self.snapshot()
        new_stages = []
        for sid, s in sorted(after.items()):
            if sid in before or s["executorRunTime"] < self.min_run_ms:
                continue
            new_stages.append(
                {
                    "id": sid,
                    "tasks": s["numCompleteTasks"],
                    "run_sec": round(s["executorRunTime"] / 1000.0, 1),
                    "cpu_sec": round(s["executorCpuTime"] / 1e9, 1),
                    "task_min_med_max": self._task_quantiles(
                        sid, s["attemptId"]
                    ),
                    "name": s["name"].split("\n")[0][:60],
                }
            )
        out[name] = {
            "sec": round(dt, 2),
            "busy_avg": bc.avg,
            "busy_peak": bc.peak,
            "timeline": [round(x, 1) for x in bc.samples],
            "stages": new_stages,
            "result": res,
        }

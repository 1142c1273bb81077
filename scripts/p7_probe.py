#!/usr/bin/env python
"""Per-stage scaling probe for the p7 pair legs + p8 clustering, reading
the p6_features checkpoint scripts/p6_probe.py leaves behind. Same
busy-core + task-summary instrumentation; locates AQE merge-skew
stragglers (see operators/neardup._repartition_even) in the band-join
exchanges.

    python scripts/p7_probe.py --master 'local-cluster[8,1,10240]'
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import threading
import time
import urllib.request


def cpu_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + vals[4]
    return sum(vals) - idle, sum(vals)


class BusyCores:
    def __enter__(self):
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._last = cpu_sample()

        def poll():
            while not self._stop.wait(1.0):
                cur = cpu_sample()
                db, dt = cur[0] - self._last[0], cur[1] - self._last[1]
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
    def avg(self):
        return round(sum(self.samples) / max(len(self.samples), 1), 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    sys.path.insert(0, "/root/repo")

    m = re.match(r"local-cluster\[(\d+),(\d+),\d+\]", args.master)
    total_cores = int(m.group(1)) * int(m.group(2)) if m else 8
    shuffle = 2 * total_cores

    from pyspark.sql import functions as F

    from fast_duplicate_finder_spark.config import PipelineConfig
    from fast_duplicate_finder_spark.operators.connected_components import (
        connected_components,
    )
    from fast_duplicate_finder_spark.operators.neardup import (
        minhash_pairs,
        simhash_pairs,
        span_pairs,
    )
    from fast_duplicate_finder_spark.session import get_spark
    from fast_duplicate_finder_spark.storage import CheckpointStore

    spark = get_spark(
        "fdf-p7-probe",
        master=args.master,
        shuffle_partitions=shuffle,
        extra_conf={"spark.locality.wait": "0s",
                    "spark.ui.enabled": "true"},
    )
    cfg = PipelineConfig()
    ck = f"/tmp/fdf_p6_probe_{total_cores}"
    store = CheckpointStore(spark, ck, cfg.fingerprint())
    features = store.read("p6_features")

    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda s: s, LongType())
    spark.range(0, 100_000, 1, shuffle).select(warm("id")).count()

    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl

    def stages_snapshot():
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            ) as r:
                return {s["stageId"]: s for s in json.load(r)}
        except Exception:
            return {}

    def step(name, fn, out):
        before = stages_snapshot()
        with BusyCores() as bc:
            t0 = time.perf_counter()
            res = fn()
            dt = time.perf_counter() - t0
        after = stages_snapshot()
        st = []
        for sid, s in sorted(after.items()):
            if sid in before:
                continue
            try:
                with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}/"
                    f"{s['attemptId']}/taskSummary?quantiles=0,0.5,1.0"
                ) as r:
                    q = json.load(r)
                dur = [round(x / 1000.0, 1) for x in q["duration"]]
            except Exception:
                dur = []
            if s["executorRunTime"] < 500:
                continue
            st.append({
                "id": sid, "tasks": s["numCompleteTasks"],
                "run_sec": round(s["executorRunTime"] / 1000.0, 1),
                "task_min_med_max": dur,
            })
        out[name] = {"sec": round(dt, 2), "busy_avg": bc.avg,
                     "stages": st, "result": res}

    for rep in range(args.reps):
        out: dict = {}
        step("p7a_minhash", lambda: (lambda p, o: p.count())(
            *minhash_pairs(features, cfg)), out)
        step("p7b_simhash", lambda: (lambda p, o: p.count())(
            *simhash_pairs(features, cfg)), out)
        step("p7c_span", lambda: (lambda p, o: p.count())(
            *span_pairs(features, cfg)), out)
        # p8 on the real pair distribution: all three legs' pairs
        mh, _ = minhash_pairs(features, cfg)
        sh, _ = simhash_pairs(features, cfg)
        sp, _ = span_pairs(features, cfg)
        pairs = (
            mh.select("conv_id_a", "conv_id_b")
            .union(sh.select("conv_id_a", "conv_id_b"))
            .union(sp.select("conv_id_a", "conv_id_b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        step("p8_cc", lambda: connected_components(pairs).count(), out)
        print(json.dumps({"master": args.master, "rep": rep, **{
            k: {kk: vv for kk, vv in v.items() if kk != "result"}
            for k, v in out.items()}}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

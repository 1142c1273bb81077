#!/usr/bin/env python
"""Isolate WHY p6_features scales only ~2.3x from 2 to 8 executors
(BENCH/ladder_r4_subknee.json) when p7a/p7c reach 3.0-3.4x.

Times three nested slices of the phase on the ladder corpus, sampling
host busy cores during each, in a fresh JVM per master:

  A. shingle_features only (JVM tokenize + lead-window + collect_list)
  B. near_dup_features (A + both Arrow kernels + the supershingle HOF)
  C. B + the bucketed checkpoint write (the full phase as the pipeline
     runs it)

B-A = Python-kernel + HOF marginal cost; C-B = parquet encode/write.
Busy-core samples distinguish "not enough parallel work" (busy << claimed
cores) from "past the host's membw knee" (busy >> claimed cores via
JVM/Python overlap — see BENCH/host_calibration_r3.json).

    python scripts/p6_probe.py --master 'local-cluster[8,1,10240]' \
        --input /tmp/fdf_scaling/corpus_800000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time


def cpu_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + vals[4]
    return sum(vals) - idle, sum(vals)


class BusyCores:
    """Average + peak host busy cores over the guarded block."""

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--input", default="/tmp/fdf_scaling/corpus_800000")
    ap.add_argument("--shuffle-partitions", type=int, default=0,
                    help="0 = ladder rule (2 x total cores)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import re

    m = re.match(r"local-cluster\[(\d+),(\d+),\d+\]", args.master)
    total_cores = int(m.group(1)) * int(m.group(2)) if m else 8
    shuffle = args.shuffle_partitions or 2 * total_cores

    from pyspark.sql import functions as F

    from fast_duplicate_finder_spark.config import PipelineConfig
    from fast_duplicate_finder_spark.operators.neardup import (
        near_dup_features,
        shingle_features,
    )
    from fast_duplicate_finder_spark.session import get_spark
    from fast_duplicate_finder_spark.sources.transcripts import (
        assemble_conversations,
    )
    from fast_duplicate_finder_spark.storage import CheckpointStore

    spark = get_spark(
        "fdf-p6-probe",
        master=args.master,
        shuffle_partitions=shuffle,
        extra_conf={"spark.locality.wait": "0s",
                    "spark.ui.enabled": "true"},
    )
    cfg = PipelineConfig()
    transcripts = spark.read.parquet(args.input)

    # pandas-UDF worker warmup (same as scaling_leg)
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda s: s, LongType())
    spark.range(0, 100_000, 1, shuffle).select(warm("id")).count()

    # p6_all_docs equivalent, checkpointed once so every step reads the
    # same materialized input (as the pipeline does)
    ck = f"/tmp/fdf_p6_probe_{total_cores}"
    store = CheckpointStore(spark, ck, cfg.fingerprint())
    docs = store.write(assemble_conversations(transcripts), "docs")

    import urllib.request

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
        new_stages = []
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
            new_stages.append({
                "id": sid,
                "tasks": s["numCompleteTasks"],
                "run_sec": round(s["executorRunTime"] / 1000.0, 1),
                "cpu_sec": round(s["executorCpuTime"] / 1e9, 1),
                "task_min_med_max": dur,
                "name": s["name"].split("\n")[0][:60],
            })
        out[name] = {"sec": round(dt, 2), "busy_avg": bc.avg,
                     "busy_peak": bc.peak, "timeline": [
                         round(x, 1) for x in bc.samples],
                     "stages": new_stages, "result": res}

    runs = []
    for rep in range(args.reps):
        out: dict = {}
        # A: JVM-only slice; sink forces full column evaluation
        step("A_shingle_jvm", lambda: shingle_features(docs, cfg).agg(
            F.sum(F.size("shset")), F.sum(F.size("grams"))
        ).collect()[0][0], out)
        # B: + Arrow kernels + HOF; cheap agg sink, no parquet encode
        step("B_features_nowrite", lambda: near_dup_features(docs, cfg).agg(
            F.sum(F.size("shset")),
            F.bit_xor(F.element_at("minhash", 1)),
            F.bit_xor("simhash"),
            F.sum(F.size("sgs")),
        ).collect()[0][0], out)
        # C: the full phase — bucketed checkpoint write like run_pipeline
        import shutil

        shutil.rmtree(os.path.join(ck, "p6_features"), ignore_errors=True)
        step("C_full_phase", lambda: store.write(
            near_dup_features(docs, cfg), "p6_features",
            bucket_by=["conv_id"],
        ).count(), out)
        runs.append(out)
        print(json.dumps({"master": args.master, "rep": rep, **{
            k: {kk: vv for kk, vv in v.items() if kk != "result"}
            for k, v in out.items()}}, indent=1), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""One scaling-ladder leg: run the full pipeline once in a FRESH JVM under
the given master and print one JSON line with wall time + throughput.

Run via scripts/scaling_ladder.py (which launches each leg as a separate
subprocess so no JVM/page-cache state leaks between legs); usable alone:

    python scripts/scaling_leg.py --master 'local-cluster[4,8,6144]' \
        --input /tmp/fdf_scaling/corpus --ckpt /tmp/fdf_scaling/ckpt_x
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--shuffle-partitions", type=int, required=True)
    ap.add_argument("--warmup-runs", type=int, default=1,
                    help="untimed full-pipeline runs before the timed ones "
                         "(steady-state measurement: JIT tier-up is a "
                         "small-corpus artifact that a 100 TB run "
                         "amortizes to nothing)")
    ap.add_argument("--timed-runs", type=int, default=1,
                    help="timed runs after warm-up; wall = MIN of them. "
                         "The shared host's throughput drifts 2-3x across "
                         "20-minute windows (BENCH/BASELINE.md), so each "
                         "warmed JVM samples several windows — best-of is "
                         "the only estimator that converges on the "
                         "machine's quiet-window capability")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from fast_duplicate_finder_spark.config import PipelineConfig
    from fast_duplicate_finder_spark.plans.pipeline import run_pipeline
    from fast_duplicate_finder_spark.session import get_spark

    spark = get_spark(
        "fdf-scaling-leg",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        # many small stages + cached/checkpointed blocks: 3s default
        # locality waits serialize multi-executor runs on a single host
        extra_conf={"spark.locality.wait": "0s"},
    )
    transcripts = spark.read.parquet(args.input)
    n_turns = transcripts.count()  # warms input listing + executor JVMs

    # pandas-UDF warmup: first use pays ~1s/worker of numpy+pandas imports
    # across every Python worker — a fixed cost that would otherwise bias
    # the small-N leg (memory: spark-bench-pitfalls)
    import pandas as pd
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda s: s, LongType())
    spark.range(0, 100_000, 1, args.shuffle_partitions).select(
        warm("id")
    ).count()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from probe_util import cpu_sample

    walls = []
    phase_runs = []
    report = None
    for i in range(args.warmup_runs + args.timed_runs):
        ck = f"{args.ckpt}_{i}"
        shutil.rmtree(ck, ignore_errors=True)
        c0 = cpu_sample()
        t0 = time.perf_counter()
        report = run_pipeline(
            spark, transcripts, PipelineConfig(), ck, resume=False
        )
        walls.append(round(time.perf_counter() - t0, 2))
        c1 = cpu_sample()
        phase_runs.append(
            {
                "wall_sec": walls[-1],
                "host_busy_cores": round(
                    (c1[0] - c0[0]) / max(c1[1] - c0[1], 1)
                    * os.cpu_count(), 1,
                ),
                "phase_seconds": {
                    m["phase"]: m["seconds"]
                    for m in report.metrics
                    if "seconds" in m
                },
            }
        )
    wall = min(walls[args.warmup_runs:])
    print(
        json.dumps(
            {
                "master": args.master,
                "turns": n_turns,
                "wall_sec": wall,
                "all_walls": walls,
                "turns_per_sec": round(n_turns / wall, 1),
                "file_sets": report.summary["file_sets"],
                "near_dup_clusters": report.summary["near_dup_clusters"],
                "runs_detail": phase_runs,
            }
        )
    )
    spark.stop()
    # each run's checkpoint tree is ~2.5 GB at the 800k-conv corpus; a
    # 2-ladder session (24 runs) would fill the 70 GB disk if legs never
    # cleaned up after themselves (they already rmtree BEFORE each run,
    # but the last run of every leg used to linger)
    for i in range(args.warmup_runs + args.timed_runs):
        shutil.rmtree(f"{args.ckpt}_{i}", ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Measured dup-pair recall at scale — BASELINE.json metric #1.

Runs the REAL pipeline (plans.pipeline.run_pipeline, checkpoints and all) on
the distributed planted corpus, derives ground truth from the realized data
(evaluation.ground_truth_tiers), and records pair- and cluster-level recall
plus wall time / throughput to BENCH/recall_r4.json.

    python scripts/recall_probe.py --n-convs 800000 \
        --input /tmp/fdf_scaling/corpus_800000

Reuses the scaling-ladder corpus when present (same generator, same seed).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=800_000)
    ap.add_argument("--input", default=None,
                    help="parquet corpus dir (generated if absent)")
    ap.add_argument("--ckpt", default="/tmp/fdf_recall/ckpt")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "recall_r4.json"))
    ap.add_argument("--keep-ckpt", action="store_true")
    args = ap.parse_args()

    from fast_duplicate_finder_spark.config import DEFAULT_CONFIG
    from fast_duplicate_finder_spark.evaluation import (
        ground_truth_tiers,
        planted_pairs,
        recall_report,
    )
    from fast_duplicate_finder_spark.plans.pipeline import run_pipeline
    from fast_duplicate_finder_spark.session import get_spark
    from fast_duplicate_finder_spark.sources.transcripts import (
        assemble_conversations,
    )
    from scaling_ladder import ensure_corpus  # noqa: E402 — shared generator

    input_path = args.input or f"/tmp/fdf_recall/corpus_{args.n_convs}"
    ensure_corpus(input_path, args.n_convs)

    spark = get_spark(
        "fdf-recall-probe",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    transcripts = spark.read.parquet(input_path)
    n_turns = transcripts.count()
    # ensure_corpus only checks _SUCCESS — an existing corpus of a different
    # size would silently shrink the truth via the planted-pair arithmetic
    n_actual = transcripts.select("conv_id").distinct().count()
    if n_actual != args.n_convs:
        raise SystemExit(
            f"corpus at {input_path} has {n_actual} convs, "
            f"--n-convs says {args.n_convs}"
        )

    if os.path.isdir(args.ckpt):
        shutil.rmtree(args.ckpt)
    t0 = time.perf_counter()
    report = run_pipeline(
        spark,
        transcripts,
        DEFAULT_CONFIG,
        args.ckpt,
        resume=False,
        with_groups=False,  # flat conv ids: no group phase in this corpus
    )
    wall = time.perf_counter() - t0

    truth = ground_truth_tiers(
        assemble_conversations(transcripts),
        planted_pairs(spark, args.n_convs),
        DEFAULT_CONFIG,
    )
    rep = recall_report(truth, report.near_clusters, report.near_pairs)
    rep.update(
        n_convs=args.n_convs,
        n_turns=n_turns,
        pipeline_wall_sec=round(wall, 1),
        turns_per_sec=round(n_turns / wall, 1),
        master=args.master,
        config_fingerprint=DEFAULT_CONFIG.fingerprint(),
        gate_pass=bool(
            rep.get("recall_clusters", 0.0) >= 0.99
            and rep.get("recall_exact_clusters", 0.0) == 1.0
            and rep.get("n_missing_input_pairs", 0) == 0
        ),
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1, default=str)
    print(json.dumps(rep, default=str))
    if not args.keep_ckpt:
        shutil.rmtree(args.ckpt, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

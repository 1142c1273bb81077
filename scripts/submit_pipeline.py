#!/usr/bin/env python
"""spark-submit entry point for the transcript dedup pipeline.

Cluster usage (north_rule: ``spark-submit --py-files`` at N and 4N
executors)::

    cd /root/repo && zip -qr /tmp/fdf.zip fast_duplicate_finder_spark
    spark-submit --py-files /tmp/fdf.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        scripts/submit_pipeline.py \
        --input /path/to/transcripts_parquet_or_iceberg_table \
        --checkpoint-dir /path/to/checkpoints \
        [--no-resume] [--no-near-dup] [--no-groups] \
        [--shuffle-partitions 2048]

Local smoke (same code path, local master picked up from spark-submit
defaults)::

    python scripts/submit_pipeline.py --generate 2000 \
        --checkpoint-dir /tmp/fdf_ckpt

The session is created by spark-submit's conf (master/executors); this
script only adds SQL-level settings, so the same file serves local[?] and a
1000-executor cluster unchanged. Output tables land under
``<checkpoint-dir>/<phase>/data``; the JSON summary is printed to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts table (parquet dir / Iceberg name)")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "json"])
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a synthetic corpus of N convs instead of --input")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--no-groups", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("fdf-pipeline")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()

    from fast_duplicate_finder_spark.config import PipelineConfig
    from fast_duplicate_finder_spark.plans.pipeline import run_pipeline
    from fast_duplicate_finder_spark.sources.transcripts import load_transcripts

    if args.generate:
        from fast_duplicate_finder_spark.corpus import (
            generate_transcripts_distributed,
        )

        transcripts = generate_transcripts_distributed(spark, args.generate)
    elif args.input:
        transcripts = load_transcripts(spark, args.input, fmt=args.format)
    else:
        ap.error("one of --input / --generate is required")
        return 2

    snapshot = None
    if args.input and args.format == "parquet":
        import os

        from fast_duplicate_finder_spark.storage import parquet_snapshot_id

        if os.path.exists(args.input):
            snapshot = parquet_snapshot_id(args.input)

    from fast_duplicate_finder_spark.plans.progress import ProgressReporter

    progress = ProgressReporter()
    progress.subscribe(
        lambda ev: print(
            f"[{ev['percent']:5.1f}%] {ev['phase']}: {ev['status']}"
            + (f" ({ev['rows']} rows)" if ev.get("rows") is not None else ""),
            file=sys.stderr,
        )
    )
    report = run_pipeline(
        spark,
        transcripts,
        PipelineConfig(),
        args.checkpoint_dir,
        resume=not args.no_resume,
        with_near_dup=not args.no_near_dup,
        with_groups=not args.no_groups,
        input_snapshot=snapshot,
        progress=progress,
    )
    print(json.dumps({"summary": report.summary, "metrics": report.metrics}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

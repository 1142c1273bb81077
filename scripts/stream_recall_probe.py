#!/usr/bin/env python
"""Measured dup-pair recall through the STREAMING path — round-5 item #2.

Round 4 measured recall 1.000 at 800k convs through the *batch* pipeline
(scripts/recall_probe.py -> BENCH/recall_r4.json); the incremental legs had
only batch-equivalence pins at pytest scale. This probe converts
"batch-equivalent by construction" into a measured end-to-end number at the
same scale:

1. the planted corpus is split into K epoch files and streamed through the
   three incremental legs (exact / SimHash / MinHash-LSH,
   ``maxFilesPerTrigger=1`` -> K micro-batches each, cross-epoch pairs
   exercised);
2. the legs' pair logs are re-published per source epoch as the pair feed
   of the incremental-clustering leg (the same composition
   scripts/stream_probe.py measures: an epoch-partitioned pair log doubles
   as the next stream's file source);
3. recall is scored by the SAME evaluation module as the batch probe —
   ground truth from the realized data, pair-level recall from the streamed
   pair logs, cluster-level recall from ``read_cluster_labels``.

    python scripts/stream_recall_probe.py --n-convs 800000 --batches 16

Reuses the batch recall probe's corpus cache when present (same generator,
same seed).
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
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--corpus", default=None,
                    help="parquet corpus dir (generated if absent)")
    ap.add_argument("--work", default="/tmp/fdf_stream_recall")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "recall_stream_r5.json"))
    ap.add_argument("--keep-work", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fast_duplicate_finder_spark.config import DEFAULT_CONFIG
    from fast_duplicate_finder_spark.evaluation import (
        ground_truth_tiers,
        planted_pairs,
        recall_report,
    )
    from fast_duplicate_finder_spark.session import get_spark
    from fast_duplicate_finder_spark.sources.transcripts import (
        assemble_conversations,
    )
    from fast_duplicate_finder_spark.streaming import incremental as inc
    from scaling_ladder import ensure_corpus  # noqa: E402 — shared generator

    corpus = args.corpus or f"/tmp/fdf_recall/corpus_{args.n_convs}"
    ensure_corpus(corpus, args.n_convs)

    spark = get_spark(
        "fdf-stream-recall-probe",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    transcripts = spark.read.parquet(corpus)
    n_turns = transcripts.count()
    n_actual = transcripts.select("conv_id").distinct().count()
    if n_actual != args.n_convs:
        raise SystemExit(
            f"corpus at {corpus} has {n_actual} convs, "
            f"--n-convs says {args.n_convs}"
        )

    shutil.rmtree(args.work, ignore_errors=True)
    inp = os.path.join(args.work, "in")

    # K epoch files by conv range (stream_probe's split): every batch holds
    # fresh convs plus planted dups of earlier batches' content, so
    # cross-epoch pairs dominate and the state join is exercised at full
    # accumulated-state size on the last batches.
    per = args.n_convs // args.batches
    for b in range(args.batches):
        lo = f"conv{b * per:09d}"
        hi_conv = (b + 1) * per if b < args.batches - 1 else args.n_convs
        hi = f"conv{hi_conv:09d}"
        (transcripts
         .filter((F.col("conv_id") >= lo) & (F.col("conv_id") < hi))
         .coalesce(1)
         .write.parquet(os.path.join(inp, f"b{b:02d}.parquet")))

    # pandas-UDF worker warmup (same rationale as scaling_leg): the first
    # Arrow batch otherwise pays the Python-worker fork inside a timed leg
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda s: s, LongType())
    spark.range(0, 100_000, 1, args.shuffle_partitions).select(
        warm("id")
    ).count()

    out: dict = {
        "n_convs": args.n_convs,
        "n_turns": n_turns,
        "batches": args.batches,
        "master": args.master,
        "config_fingerprint": DEFAULT_CONFIG.fingerprint(),
        "legs": {},
    }
    legs = {
        "exact": inc.run_incremental_dedup,
        "simhash": inc.run_incremental_simhash,
        "lsh": inc.run_incremental_lsh,
    }
    for name, runner in legs.items():
        wd = os.path.join(args.work, name)
        t0 = time.perf_counter()
        q = runner(spark, inp + "/*", wd, max_files_per_trigger=1)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        out["legs"][name] = {
            "wall_sec": round(wall, 1),
            "turns_per_sec": round(n_turns / wall, 1),
        }
        print(json.dumps({name: out["legs"][name]}), flush=True)

    # Streamed pair logs. Pair-level recall scores the same legs the batch
    # report's near_pairs carries (MinHash/LSH verified pairs + exact star
    # edges); the cluster feed additionally unions the SimHash edges, like
    # the batch pipeline's connected components input.
    lsh_pairs = (
        inc.read_lsh_pair_log(spark, os.path.join(args.work, "lsh"))
        .filter(~F.col("is_overflow"))
        .select("conv_id_a", "conv_id_b", "epoch_id")
    )
    exact_edges = (
        inc.read_dup_log(spark, os.path.join(args.work, "exact"))
        .select(
            F.col("conv_id").alias("conv_id_a"),
            F.col("first_conv_id").alias("conv_id_b"),
            "epoch_id",
        )
    )
    sim_pairs = (
        inc.read_near_pair_log(spark, os.path.join(args.work, "simhash"))
        .filter(~F.col("is_overflow"))
        .select("conv_id_a", "conv_id_b", "epoch_id")
    )
    pair_counts = {
        "lsh_pairs": lsh_pairs.count(),
        "exact_edges": exact_edges.count(),
        "simhash_pairs": sim_pairs.count(),
    }
    out["streamed_pair_rows"] = pair_counts
    print(json.dumps(pair_counts), flush=True)

    # Re-publish the union as the clusters leg's pair feed, keyed by the
    # SOURCE epoch (each leg assigns the same epoch ids to the same input
    # files under availableNow, so the union preserves arrival order).
    feed = os.path.join(args.work, "feed")
    (lsh_pairs.unionByName(exact_edges).unionByName(sim_pairs)
     .withColumn("is_overflow", F.lit(False))
     .repartition(args.batches, "epoch_id")
     .write.partitionBy("epoch_id").parquet(feed))

    wd = os.path.join(args.work, "clusters")
    t0 = time.perf_counter()
    q = inc.run_incremental_clusters(
        spark, os.path.join(feed, "epoch_id=*"), wd, max_files_per_trigger=1
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    labels = inc.read_cluster_labels(spark, wd)
    n_pairs_fed = sum(pair_counts.values())
    out["legs"]["clusters"] = {
        "wall_sec": round(wall, 1),
        "pairs_per_sec": round(n_pairs_fed / wall, 1),
        "labeled_convs": labels.count(),
        "clusters": labels.select("label").distinct().count(),
    }
    print(json.dumps({"clusters": out["legs"]["clusters"]}), flush=True)

    truth = ground_truth_tiers(
        assemble_conversations(transcripts),
        planted_pairs(spark, args.n_convs),
        DEFAULT_CONFIG,
    )
    rep = recall_report(
        truth,
        clusters=labels.select(
            "conv_id", F.col("label").alias("component")
        ),
        near_pairs=lsh_pairs.unionByName(exact_edges),
    )
    out.update(rep)
    total_wall = sum(leg["wall_sec"] for leg in out["legs"].values())
    out["total_stream_wall_sec"] = round(total_wall, 1)
    out["turns_per_sec_total"] = round(n_turns / total_wall, 1)
    out["gate_pass"] = bool(
        rep.get("recall_clusters", 0.0) >= 0.99
        and rep.get("recall_exact_clusters", 0.0) == 1.0
        and rep.get("n_missing_input_pairs", 0) == 0
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str))
    if not args.keep_work:
        shutil.rmtree(args.work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

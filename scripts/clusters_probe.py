#!/usr/bin/env python
"""Scale probe for the incremental clustering leg (run_incremental_clusters).

Generates a deterministic synthetic PAIR stream with real merge pressure —
each epoch plants intra-epoch chains (fresh components) plus links that
union each new cluster with the PREVIOUS epoch's corresponding cluster, so
every epoch dethrones ~n_clusters roots and the merge DAG's chase depth
grows by one per epoch (the leg's worst case; compaction resets it).

Measures per-epoch batch latency (state grows as epochs pass), total
pairs/s, end-read latency before and after compaction, and VERIFIES the
streamed labels equal batch connected_components over all pairs.

    python scripts/clusters_probe.py --epochs 8 --clusters 20000 --size 8
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--clusters", type=int, default=20_000,
                    help="clusters planted per epoch")
    ap.add_argument("--size", type=int, default=8,
                    help="convs per planted cluster")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--work", default="/tmp/fdf_clusters_probe")
    ap.add_argument("--skip-verify", action="store_true",
                    help="skip the batch-CC equality check")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fast_duplicate_finder_spark.session import get_spark
    from fast_duplicate_finder_spark.streaming import incremental as inc

    shutil.rmtree(args.work, ignore_errors=True)
    inp = os.path.join(args.work, "in")
    os.makedirs(inp)
    spark = get_spark(
        "fdf-clusters-probe",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    # Epoch e, cluster k: convs e{e}k{k}m{j}. Intra-epoch chain joins the
    # cluster's members; one cross link per cluster unions it with epoch
    # e-1's cluster k. After epoch e the true root of lineage k is epoch
    # 0's minimum (e0k{k}m0) and each epoch has dethroned the previous
    # fresh root — n_clusters merges per epoch, chase depth ~e.
    def conv(e: int, k: int, j: int) -> str:
        return f"e{e:02d}k{k:06d}m{j:02d}"

    # per-epoch pairs: the chain, plus one cross link per cluster from
    # epoch 1 on (epoch 0 has no previous epoch to union with)
    n_pairs_epoch0 = args.clusters * (args.size - 1)
    n_pairs_epoch = n_pairs_epoch0 + args.clusters
    for e in range(args.epochs):
        ids = spark.range(args.clusters).select(
            F.col("id").cast("int").alias("k")
        )
        chain = ids.select(
            "k",
            F.explode(
                F.array(*[F.lit(j) for j in range(args.size - 1)])
            ).alias("j"),
        ).select(
            F.format_string(f"e{e:02d}k%06dm%02d", "k", "j").alias("conv_id_a"),
            F.format_string(f"e{e:02d}k%06dm%02d", "k", F.col("j") + 1).alias(
                "conv_id_b"
            ),
            F.lit(False).alias("is_overflow"),
        )
        batch = chain
        if e > 0:
            cross = ids.select(
                F.format_string(f"e{e - 1:02d}k%06dm00", "k").alias(
                    "conv_id_a"
                ),
                F.format_string(f"e{e:02d}k%06dm00", "k").alias("conv_id_b"),
                F.lit(False).alias("is_overflow"),
            )
            batch = batch.unionByName(cross)
        tmp = os.path.join(args.work, f"t{e}")
        batch.coalesce(1).write.parquet(tmp)
        shutil.move(
            glob.glob(os.path.join(tmp, "part*.parquet"))[0],
            os.path.join(inp, f"b{e:02d}.parquet"),
        )

    wd = os.path.join(args.work, "clusters")
    t0 = time.perf_counter()
    q = inc.run_incremental_clusters(spark, inp, wd, max_files_per_trigger=1)
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progress = [json.loads(str(p)) for p in q.recentProgress]
    batch_ms = [p["batchDuration"] for p in progress
                if p.get("numInputRows", 0) > 0]

    t1 = time.perf_counter()
    labels = inc.read_cluster_labels(spark, wd).localCheckpoint(eager=True)
    read_sec = time.perf_counter() - t1
    n_convs = labels.count()
    n_clusters = labels.select("label").distinct().count()

    t2 = time.perf_counter()
    inc.compact_cluster_state(spark, wd)
    compact_sec = time.perf_counter() - t2
    t3 = time.perf_counter()
    labels2 = inc.read_cluster_labels(spark, wd).localCheckpoint(eager=True)
    read_after_sec = time.perf_counter() - t3
    assert labels2.count() == n_convs

    total_pairs = (
        args.epochs * args.clusters * (args.size - 1)
        + (args.epochs - 1) * args.clusters
    )
    out = {
        "epochs": args.epochs,
        "clusters_per_epoch": args.clusters,
        "cluster_size": args.size,
        "total_pairs": total_pairs,
        "master": args.master,
        "stream_wall_sec": round(wall, 1),
        "pairs_per_sec": round(total_pairs / wall, 1),
        "batch_ms_per_epoch": batch_ms,
        "labeled_convs": n_convs,
        "final_clusters": n_clusters,
        "expected_clusters": args.clusters,
        "read_labels_sec": round(read_sec, 2),
        "compact_sec": round(compact_sec, 2),
        "read_labels_after_compact_sec": round(read_after_sec, 2),
        "n_pairs_epoch0": n_pairs_epoch0,
        "n_pairs_per_later_epoch": n_pairs_epoch,
    }
    ok = n_clusters == args.clusters
    if not args.skip_verify:
        from fast_duplicate_finder_spark.operators.connected_components import (
            connected_components,
        )

        allp = spark.read.parquet(os.path.join(inp, "*.parquet")).select(
            "conv_id_a", "conv_id_b"
        )
        t4 = time.perf_counter()
        want = connected_components(allp)
        mism = (
            labels2.withColumnRenamed("label", "got")
            .join(want, "conv_id", "full")
            .filter(
                F.col("got").isNull()
                | F.col("component").isNull()
                | (F.col("got") != F.col("component"))
            )
            .count()
        )
        out["batch_cc_verify_sec"] = round(time.perf_counter() - t4, 1)
        out["label_mismatches_vs_batch_cc"] = mism
        ok = ok and mism == 0
    out["ok"] = ok
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    shutil.rmtree(args.work, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

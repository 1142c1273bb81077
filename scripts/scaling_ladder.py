#!/usr/bin/env python
"""N-vs-4N-executor scaling ladder with REAL separate executor JVMs.

north_rule gate: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in the sandbox, so the faithful proxy is
``local-cluster[N,cores,mem]`` — Spark's test cluster backend that launches
N genuine executor JVMs (own heaps, own GC, own Python worker pools) plus a
driver, removing the shared-heap artifact that capped round 1's
threads-in-one-JVM ladder at 0.55.

Protocol (memory: spark-bench-pitfalls — noisy host, orphan JVMs):
* each leg runs in a FRESH subprocess/JVM (scripts/scaling_leg.py);
* legs are interleaved (N,4N,4N,N) and best-of-R per size is used;
* identical per-executor resources (cores, heap) at both sizes;
* the measured job is the full 9-phase pipeline on the same parquet corpus,
  after input + pandas-UDF warmup inside each leg.

Writes BENCH/ladder_r3.json and prints the efficiency line for
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_corpus(path: str, n_convs: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    sys.path.insert(0, REPO)
    from fast_duplicate_finder_spark.corpus import (
        generate_transcripts_distributed,
    )
    from fast_duplicate_finder_spark.session import get_spark

    spark = get_spark("fdf-ladder-gen", master="local[32]",
                      shuffle_partitions=32)
    df = generate_transcripts_distributed(spark, n_convs, partitions=64)
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def run_leg(master: str, input_path: str, ckpt: str, shuffle: int,
            timed_runs: int = 1) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "scaling_leg.py"),
        "--master", master,
        "--input", input_path,
        "--ckpt", ckpt,
        "--shuffle-partitions", str(shuffle),
        "--timed-runs", str(timed_runs),
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=7200
    )
    if out.returncode != 0:
        raise RuntimeError(f"leg failed: {master}\n{out.stderr[-4000:]}")
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    # defaults = the documented BENCH/BASELINE.md protocol: 2 vs 8
    # executors x 4 cores x 10 GiB, 800k convs / 5.17M turns (big enough
    # that phase-boundary fixed cost is amortized — see BASELINE.md)
    ap.add_argument("--n-convs", type=int, default=800_000)
    ap.add_argument("--cores-per-executor", type=int, default=4)
    ap.add_argument("--mem-mb", type=int, default=10240)
    ap.add_argument("--small-n", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--timed-runs", type=int, default=2,
                    help="timed pipeline runs per warmed leg JVM; the leg "
                         "reports the MIN (host throughput drifts 2-3x "
                         "across 20-min windows — more samples per leg)")
    ap.add_argument("--work-dir", default="/tmp/fdf_scaling")
    ap.add_argument("--corpus", default=None,
                    help="existing corpus parquet dir (default "
                         "{work-dir}/corpus_{n_convs}, generated if absent)")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "ladder_r3.json"))
    args = ap.parse_args()

    corpus = args.corpus or os.path.join(
        args.work_dir, f"corpus_{args.n_convs}"
    )
    os.makedirs(args.work_dir, exist_ok=True)
    ensure_corpus(corpus, args.n_convs)

    sizes = [args.small_n, args.small_n * 4]
    c = args.cores_per_executor
    runs: list[dict] = []
    # interleave: small, big, big, small, ... so host drift hits both sizes
    order = []
    for r in range(args.reps):
        order += sizes if r % 2 == 0 else sizes[::-1]
    for i, n_exec in enumerate(order):
        master = f"local-cluster[{n_exec},{c},{args.mem_mb}]"
        shuffle = 2 * n_exec * c
        ckpt = os.path.join(args.work_dir, f"ckpt_{i}_{n_exec}")
        res = run_leg(master, corpus, ckpt, shuffle,
                      timed_runs=args.timed_runs)
        res["n_executors"] = n_exec
        runs.append(res)
        print(json.dumps(res), flush=True)

    best = {
        n: max(r["turns_per_sec"] for r in runs if r["n_executors"] == n)
        for n in sizes
    }
    eff = best[sizes[1]] / (4.0 * best[sizes[0]])
    result = {
        "corpus_convs": args.n_convs,
        "turns": runs[0]["turns"],
        "cores_per_executor": c,
        "mem_mb_per_executor": args.mem_mb,
        "reps": args.reps,
        "runs": runs,
        "best_turns_per_sec": best,
        "scaling_efficiency_Nto4N": round(eff, 3),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(
        f"N={sizes[0]} exec: {best[sizes[0]]} turns/s | "
        f"4N={sizes[1]} exec: {best[sizes[1]]} turns/s | "
        f"efficiency {eff:.3f} (gate >= 0.8)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

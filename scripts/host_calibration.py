#!/usr/bin/env python
"""Host capability calibration for the N-vs-4N scaling ladder.

The ladder compares 2 vs 8 executors (8 vs 32 busy cores) ON ONE shared
VM. Interpreting its efficiency as *plan* scaling assumes the host itself
delivers 4x aggregate throughput at 4x busy cores — false under neighbor
contention / memory-bandwidth ceilings. This tool measures that
denominator directly: a fixed TOTAL amount of Spark-shaped work (64-bit
hashing over word shingles + a memory-streaming pass, pure Python/numpy,
no Spark, no shuffle, no disk) is split across P worker processes; we
record aggregate throughput at P=8 and P=32, interleaved best-of-R like
the ladder.

    host 8->32 speedup S_host (<= 4.0)
    plan efficiency (host-adjusted) = pipeline_speedup / S_host

Usage: python scripts/host_calibration.py [--reps 3] [--out FILE]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import time

import numpy as np

WORK_UNITS_TOTAL = 256  # fixed total work, split across P workers
HASH_BYTES_PER_UNIT = 6_000_000  # md5-stream bytes per unit (CPU-ish)
MEM_ELEMS_PER_UNIT = 12_000_000  # int64 stream elems per unit (membw-ish)


def _one_unit(seed: int) -> int:
    """One work unit: hash a pseudo-corpus buffer in 64 KiB chunks, then a
    memory-streaming xor/shift pass over an int64 array (the two resource
    profiles of the pipeline's heavy phases: kernel CPU + shuffle membw)."""
    rng = np.random.default_rng(seed)
    buf = rng.integers(0, 255, HASH_BYTES_PER_UNIT, dtype=np.uint8).tobytes()
    h = hashlib.md5()
    for off in range(0, len(buf), 65536):
        h.update(buf[off : off + 65536])
    arr = rng.integers(0, 2**62, MEM_ELEMS_PER_UNIT, dtype=np.int64)
    acc = np.bitwise_xor.reduce(arr >> 7) ^ np.bitwise_xor.reduce(arr << 3)
    return (h.digest()[0] ^ int(acc)) & 0xFF


def _worker(args: tuple[int, int]) -> int:
    n_units, seed = args
    out = 0
    for i in range(n_units):
        out ^= _one_unit(seed + i)
    return out


def run_at(p: int) -> float:
    """Wall seconds for WORK_UNITS_TOTAL units split across p processes."""
    per = WORK_UNITS_TOTAL // p
    assert per * p == WORK_UNITS_TOTAL, "P must divide total units"
    t0 = time.monotonic()
    with mp.Pool(p) as pool:
        pool.map(_worker, [(per, 10_000 * w) for w in range(p)])
    return time.monotonic() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--out", default="BENCH/host_calibration.json")
    args = ap.parse_args()
    small, big = args.sizes
    walls: dict[int, list[float]] = {small: [], big: []}
    run_at(big)  # warm-up (page cache, numpy import in children)
    for rep in range(args.reps):  # interleaved like the ladder
        for p in (small, big):
            w = run_at(p)
            walls[p].append(w)
            print(f"rep {rep} P={p}: {w:.2f} s", flush=True)
    s_host = min(walls[small]) / min(walls[big])
    art = {
        "work_units": WORK_UNITS_TOTAL,
        "walls": {str(k): [round(w, 2) for w in v] for k, v in walls.items()},
        "best": {str(k): min(v) for k, v in walls.items()},
        "host_speedup_small_to_big": round(s_host, 3),
        "note": (
            "host-delivered aggregate-throughput speedup for "
            f"{small}->{big} busy cores on fixed total work; the ceiling "
            "any same-host ladder efficiency must be judged against "
            "(4.0 = ideal, unshared host)"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"host {small}->{big} busy-core speedup: {s_host:.3f} "
          f"(ideal 4.0) -> {args.out}")
    return 0


if __name__ == "__main__":
    main()

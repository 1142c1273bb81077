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

PROFILES = ("mixed", "cpu", "membw")


def _one_unit(seed: int, profile: str) -> int:
    """One work unit in one of three resource profiles:

    * cpu    — md5 over a small resident buffer (ALU/L2, ~no DRAM traffic);
    * membw  — xor/shift streaming passes over a DRAM-sized int64 array;
    * mixed  — one of each (the pipeline's heavy phases blend kernel CPU
      with shuffle/serialization memory traffic).

    Comparing the three 8->32-core speedups tells WHICH host ceiling binds:
    cpu ~4x but membw ~2x => the host's memory system, not the plan."""
    rng = np.random.default_rng(seed)
    out = 0
    if profile in ("cpu", "mixed"):
        n = HASH_BYTES_PER_UNIT * (2 if profile == "cpu" else 1)
        chunk = rng.integers(0, 255, 65536, dtype=np.uint8).tobytes()
        h = hashlib.md5()
        for _ in range(n // 65536):
            h.update(chunk)  # same resident 64 KiB -> pure compute
        out ^= h.digest()[0]
    if profile in ("membw", "mixed"):
        n = MEM_ELEMS_PER_UNIT * (2 if profile == "membw" else 1)
        arr = rng.integers(0, 2**62, n, dtype=np.int64)
        acc = np.bitwise_xor.reduce(arr >> 7) ^ np.bitwise_xor.reduce(
            arr << 3
        )
        out ^= int(acc) & 0xFF
    return out


def _worker(args: tuple[int, int, str]) -> int:
    n_units, seed, profile = args
    out = 0
    for i in range(n_units):
        out ^= _one_unit(seed + i, profile)
    return out


def run_at(p: int, profile: str) -> float:
    """Wall seconds for WORK_UNITS_TOTAL units split across p processes."""
    per = WORK_UNITS_TOTAL // p
    assert per * p == WORK_UNITS_TOTAL, "P must divide total units"
    t0 = time.monotonic()
    with mp.Pool(p) as pool:
        pool.map(_worker, [(per, 10_000 * w, profile) for w in range(p)])
    return time.monotonic() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--profiles", nargs="+", default=list(PROFILES),
                    choices=PROFILES)
    ap.add_argument("--out", default="BENCH/host_calibration.json")
    args = ap.parse_args()
    small, big = args.sizes
    walls: dict[str, dict[int, list[float]]] = {
        pr: {small: [], big: []} for pr in args.profiles
    }
    run_at(big, "mixed")  # warm-up (page cache, numpy import in children)
    for rep in range(args.reps):  # interleaved like the ladder
        for pr in args.profiles:
            for p in (small, big):
                w = run_at(p, pr)
                walls[pr][p].append(w)
                print(f"rep {rep} {pr} P={p}: {w:.2f} s", flush=True)
    art: dict = {"work_units": WORK_UNITS_TOTAL, "profiles": {}}
    for pr in args.profiles:
        s_host = min(walls[pr][small]) / min(walls[pr][big])
        art["profiles"][pr] = {
            "walls": {
                str(k): [round(w, 2) for w in v]
                for k, v in walls[pr].items()
            },
            "best": {str(k): min(v) for k, v in walls[pr].items()},
            "host_speedup_small_to_big": round(s_host, 3),
        }
        print(f"{pr}: host {small}->{big} busy-core speedup "
              f"{s_host:.3f} (ideal 4.0)")
    art["note"] = (
        "host-delivered aggregate-throughput speedup for "
        f"{small}->{big} busy cores on fixed total work, per resource "
        "profile; the ceiling any same-host ladder efficiency must be "
        "judged against (4.0 = ideal, unshared host)"
    )
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    main()

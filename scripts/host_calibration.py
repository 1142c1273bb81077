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
HASH_BYTES_PER_UNIT = 900_000_000  # resident-buffer md5 bytes (CPU-ish)
MEM_ARR_ELEMS = 32_000_000  # per-worker streaming array: 256 MiB int64
MEM_PASSES_PER_UNIT = 3  # xor/shift reduce passes per unit (membw-ish)

PROFILES = ("mixed", "cpu", "membw")

_ARR = None  # per-worker streaming array, allocated once (not per unit)


def _unit_cpu(scale: float) -> int:
    """md5 over the SAME resident 64 KiB chunk — ALU/L1 only, ~no DRAM."""
    chunk = b"\xa5" * 65536
    h = hashlib.md5()
    for _ in range(int(HASH_BYTES_PER_UNIT * scale) // 65536):
        h.update(chunk)
    return h.digest()[0]


def _unit_membw(scale: float) -> int:
    """Streaming xor/shift reduce passes over a 256 MiB resident array —
    each pass moves ~3x the array through DRAM (temp alloc + read +
    reduce), so throughput tracks the memory system, not the ALUs."""
    global _ARR
    if _ARR is None:
        _ARR = np.arange(MEM_ARR_ELEMS, dtype=np.int64) * 2654435761
    acc = 0
    for _ in range(max(int(MEM_PASSES_PER_UNIT * scale), 1)):
        acc ^= int(np.bitwise_xor.reduce(_ARR >> 7)) ^ int(
            np.bitwise_xor.reduce(_ARR << 3)
        )
    return acc & 0xFF


def _one_unit(seed: int, profile: str) -> int:
    """One work unit in one of three resource profiles:

    * cpu    — pure compute (ideal-scaling control: ~4x unless vCPUs are
      stolen by neighbors);
    * membw  — DRAM-bandwidth-bound (the shared ceiling suspect);
    * mixed  — half of each (the pipeline's heavy phases blend kernel CPU
      with shuffle/serialization memory traffic).

    Comparing the three 8->32-core speedups tells WHICH host ceiling
    binds: cpu ~4x but membw ~2x => the host's memory system, not the
    plan."""
    if profile == "cpu":
        return _unit_cpu(1.0)
    if profile == "membw":
        return _unit_membw(1.0)
    return _unit_cpu(0.5) ^ _unit_membw(0.5)


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

#!/usr/bin/env python
"""Pool every ladder artifact into one honest scaling report.

The sandbox host's throughput drifts 2-3x across 20-minute windows
(identical legs measured 484 s and 254 s; a 2-executor leg once beat two
8-executor legs). A single interleaved pair is therefore NOT evidence in
either direction. This tool pools all timed runs per cluster size across
the given ladder JSONs (same code only — don't mix pre-/post-change
artifacts), prints the full wall distribution, and computes efficiency
from best-of-N at each size — the estimator that converges on the
machine's quiet-window capability as N grows.

    python scripts/ladder_report.py BENCH/ladder_r3b.json BENCH/ladder_r3c.json
"""

from __future__ import annotations

import json
import sys


def timed_walls(run: dict) -> list[float]:
    """Timed (post-warm-up) walls of one leg. Legs record all_walls =
    [warmups..., timed...]; older artifacts have exactly 1 warm-up."""
    walls = run["all_walls"]
    n_timed = max(len(walls) - 1, 1)
    # newer legs: wall_sec == min of the timed tail; recover its length
    timed = walls[-n_timed:]
    while len(timed) > 1 and round(min(timed), 2) != round(
        run["wall_sec"], 2
    ):
        timed = timed[1:]
    return timed


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 2
    by_size: dict[int, list[float]] = {}
    turns = None
    for p in paths:
        art = json.load(open(p))
        turns = art["runs"][0]["turns"]
        for run in art["runs"]:
            by_size.setdefault(run["n_executors"], []).extend(
                timed_walls(run)
            )
    sizes = sorted(by_size)
    print(f"turns per run: {turns}")
    for n in sizes:
        walls = sorted(by_size[n])
        tps = round(turns / walls[0], 1)
        print(
            f"  {n} executors: {len(walls)} timed runs, walls "
            f"{[round(w, 1) for w in walls]} s — best {walls[0]} s "
            f"({tps} turns/s)"
        )
    if len(sizes) == 2 and sizes[1] == 4 * sizes[0]:
        small, big = sizes
        eff = (turns / min(by_size[big])) / (
            4.0 * turns / min(by_size[small])
        )
        print(
            f"best-of-N efficiency {small} -> {big} executors: "
            f"{eff:.3f} (gate >= 0.8)"
        )
        _phase_table(paths, small, big)
    return 0


def _phase_table(paths: list[str], small: int, big: int) -> None:
    """Pooled per-phase best (timed-run) walls at each size + speedup —
    shows WHERE the scaling comes from and which phases are fixed-cost."""
    best: dict[int, dict[str, float]] = {small: {}, big: {}}
    for p in paths:
        for run in json.load(open(p))["runs"]:
            n = run["n_executors"]
            timed = timed_walls(run)
            details = run.get("runs_detail", [])[-len(timed):]
            for d in details:
                for ph, s in d.get("phase_seconds", {}).items():
                    cur = best[n].get(ph)
                    best[n][ph] = s if cur is None else min(cur, s)
    phases = [ph for ph in best[small] if ph in best[big]]
    if not phases:
        return
    print(f"per-phase best timed wall (s), {small} vs {big} executors:")
    tot_s = tot_b = 0.0
    for ph in phases:
        s, b = best[small][ph], best[big][ph]
        tot_s += s
        tot_b += b
        print(f"  {ph:24s} {s:8.2f} {b:8.2f}   {s / max(b, 1e-9):5.2f}x")
    print(
        f"  {'(sum of phase best)':24s} {tot_s:8.2f} {tot_b:8.2f}   "
        f"{tot_s / max(tot_b, 1e-9):5.2f}x"
    )


if __name__ == "__main__":
    sys.exit(main())

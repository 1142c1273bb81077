#!/usr/bin/env python
"""Per-phase scaling profile from a ladder JSON (scripts/scaling_ladder.py).

For each pipeline phase, compares the timed-run seconds at the small vs big
executor count and reports the per-phase speedup — the tool for root-causing
a below-gate scaling efficiency (which phase ISN'T scaling).

    python scripts/ladder_profile.py BENCH/ladder_r3.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ladder_report import timed_walls  # noqa: E402 — shared recovery logic


def best_run(runs: list[dict], n: int) -> dict:
    """Fastest timed run for executor count ``n`` — min over every leg's
    timed (post-warm-up) runs_detail (NOT the chronologically last run of
    the best leg: on a host that drifts 2-3x that could profile the slow
    run). The timed tail is recovered by the SAME ladder_report.timed_walls
    used for the efficiency numbers (its shrink-to-match-wall_sec loop
    handles legs that recorded more than one warm-up; a local
    'len(all_walls) - 1' re-implementation once profiled a warm-up run as
    the fastest timed run)."""
    details = []
    for r in runs:
        if r["n_executors"] != n:
            continue
        d = r.get("runs_detail", [])
        details += d[-len(timed_walls(r)):]
    return min(details, key=lambda d: d["wall_sec"])


def main() -> int:
    with open(sys.argv[1]) as f:
        lad = json.load(f)
    sizes = sorted({r["n_executors"] for r in lad["runs"]})
    small, big = sizes[0], sizes[-1]
    a = best_run(lad["runs"], small)
    b = best_run(lad["runs"], big)
    pa, pb = a["phase_seconds"], b["phase_seconds"]
    ratio = big / small
    print(
        f"{'phase':<24}{small}ex(s)  {big}ex(s)  speedup  "
        f"(perfect={ratio:.0f}x)"
    )
    rows = sorted(pa, key=lambda k: -pa[k])
    tot_a = tot_b = 0.0
    for ph in rows:
        sa, sb = pa.get(ph, 0.0), pb.get(ph, 0.0)
        tot_a += sa
        tot_b += sb
        sp = sa / sb if sb else float("inf")
        flag = "  <-- not scaling" if sa > 5 and sp < ratio / 2 else ""
        print(f"{ph:<24}{sa:7.1f}{sb:8.1f}{sp:8.2f}x{flag}")
    print(f"{'SUM(phases)':<24}{tot_a:7.1f}{tot_b:8.1f}"
          f"{(tot_a / tot_b if tot_b else 0):8.2f}x")
    print(f"{'wall':<24}{a['wall_sec']:7.1f}{b['wall_sec']:8.1f}"
          f"{a['wall_sec'] / b['wall_sec']:8.2f}x")
    print(
        f"non-phase overhead: {small}ex "
        f"{a['wall_sec'] - tot_a:.1f}s, {big}ex {b['wall_sec'] - tot_b:.1f}s"
    )
    eff = (a["wall_sec"] / b["wall_sec"]) / ratio
    print(f"efficiency {small}->{big} executors: {eff:.3f} (gate >= 0.8)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Render the whole-suite sf0.1 -> sf1 ratio table from BENCH_FULL.json
(steady-state sf0.1 mins) and BENCH_SF1.json (single-rep sf1 sweep).

Usage: python scripts/sf1_table.py [top_n]   (default: all, slowest-sf1
first).  Flags any ratio > 10 (superlinear at a 10x scale-up) loudly —
the whole point of the sweep.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    full = json.load(open(os.path.join(ROOT, "BENCH_FULL.json")))
    sf1 = json.load(open(os.path.join(ROOT, "BENCH_SF1.json")))
    q01, q1 = full["queries"], sf1["queries"]
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else len(q1)
    rows = []
    for name, t1 in q1.items():
        t01 = q01.get(name)
        if t1 is None or t1 <= 0 or not t01 or t01 <= 0:
            continue
        rows.append((name, t01, t1, t1 / t01))
    rows.sort(key=lambda r: -r[2])
    bad = [r for r in rows if r[3] > 10]
    print("| query | sf0.1 (steady min) | sf1 (1 rep) | ratio |")
    print("|---|---|---|---|")
    for name, t01, t1, ratio in rows[:top_n]:
        print(f"| {name} | {t01:.2f} | {t1:.2f} | {ratio:.1f} |")
    print()
    print(
        f"n={len(rows)} compared; sf1 total {sf1['total_sec']}s; "
        f"ratios>10: {len(bad)}"
    )
    for name, t01, t1, ratio in bad:
        print(f"SUPERLINEAR: {name} {t01:.2f} -> {t1:.2f} ({ratio:.1f}x)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

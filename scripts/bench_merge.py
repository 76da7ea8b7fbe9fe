#!/usr/bin/env python
"""Merge a subset bench detail file into a saved full one.

Usage: python scripts/bench_merge.py <full.json> <subset.json> <out.json>

Per-query fields from the subset override the full run's; totals and
counts are recomputed.  Used when new queries are registered while a
whole-suite background run is in flight — bench the stragglers alone,
then fold them in instead of re-running everything.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    full_p, sub_p, out_p = sys.argv[1], sys.argv[2], sys.argv[3]
    full = json.load(open(full_p))
    sub = json.load(open(sub_p))
    for field in (
        "queries",
        "queries_median",
        "queries_reps",
        "queries_rep_lists",
        "queries_build",
    ):
        full.setdefault(field, {}).update(sub.get(field, {}))
    q = full["queries"]
    full["n_queries"] = len(q)
    full["total_sec"] = round(sum(t for t in q.values() if t > 0), 3)
    json.dump(full, open(out_p, "w"), indent=1, sort_keys=True)
    print(f"merged {len(sub.get('queries', {}))} into {out_p}: "
          f"n={full['n_queries']} total={full['total_sec']}")


if __name__ == "__main__":
    main()

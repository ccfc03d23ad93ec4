#!/usr/bin/env python
"""Compare two bench JSON lines (e.g. sf0.1 vs sf1) and print per-query
scaling factors, sorted worst-first.  Usage:
    python tools/compare_scaling.py base.json scaled.json [data_ratio]
data_ratio defaults to 10 (sf0.1 -> sf1).  A query scaling worse than
~linear-in-data (factor > data_ratio) gets flagged."""

import json
import sys


def load(p):
    with open(p) as f:
        return json.loads(f.read().strip().splitlines()[-1])


base, scaled = load(sys.argv[1]), load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
rows = []
for name, t1 in scaled["queries"].items():
    t0 = base["queries"].get(name)
    if t0:
        rows.append((t1 / t0, t0, t1, name))
rows.sort(reverse=True)
flagged = 0
for f, t0, t1, name in rows:
    mark = " <-- SUPERLINEAR" if f > ratio else ""
    if mark:
        flagged += 1
    print(f"{f:6.2f}x  {t0:7.3f} -> {t1:7.3f}  {name}{mark}")
common = [r for r in rows]
print(f"\ntotal (common {len(common)}q): "
      f"{sum(r[1] for r in common):.2f} -> {sum(r[2] for r in common):.2f} "
      f"({sum(r[2] for r in common)/sum(r[1] for r in common):.2f}x at {ratio:.0f}x data); "
      f"{flagged} flagged")

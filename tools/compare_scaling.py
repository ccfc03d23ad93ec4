#!/usr/bin/env python
"""Compare two bench outputs (e.g. sf0.1 vs sf1) and print per-query
scaling factors, sorted worst-first.  Usage:
    python tools/compare_scaling.py base.json scaled.json [data_ratio]
Accepts either a raw bench.py JSON line (last JSON object in the file)
or the driver's pretty-printed BENCH_r*.json wrappers.  data_ratio
defaults to 10 (sf0.1 -> sf1); a query scaling worse than linear-in-
data (factor > data_ratio) is flagged, and queries present in only one
file are reported instead of silently dropped."""

import json
import re
import sys


def load(p):
    text = open(p).read()
    # last JSON object in the file, whether one-line or pretty-printed
    objs = [
        json.loads(m)
        for m in re.findall(r"\{.*\}", text, flags=re.S)
    ]
    d = objs[-1]
    # driver wrappers nest the bench line under a key or hold it directly
    if "queries" not in d:
        for v in d.values():
            if isinstance(v, dict) and "queries" in v:
                d = v
                break
    if "queries" not in d:
        raise SystemExit(f"{p}: no 'queries' map found")
    return d


base, scaled = load(sys.argv[1]), load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
rows = []
for name, t1 in scaled["queries"].items():
    t0 = base["queries"].get(name)
    if t0 is not None and t0 > 0:
        rows.append((t1 / t0, t0, t1, name))
rows.sort(reverse=True)
flagged = 0
for f, t0, t1, name in rows:
    mark = " <-- SUPERLINEAR" if f > ratio else ""
    if mark:
        flagged += 1
    print(f"{f:6.2f}x  {t0:7.3f} -> {t1:7.3f}  {name}{mark}")
only_base = sorted(set(base["queries"]) - set(scaled["queries"]))
only_scaled = sorted(set(scaled["queries"]) - set(base["queries"]))
for label, missing in (("base", only_base), ("scaled", only_scaled)):
    if missing:
        print(f"only in {label} (NOT compared): {', '.join(missing)}")
if not rows:
    raise SystemExit("no common queries between the two files")
t0s, t1s = sum(r[1] for r in rows), sum(r[2] for r in rows)
print(f"\ntotal (common {len(rows)}q): {t0s:.2f} -> {t1s:.2f} "
      f"({t1s / t0s:.2f}x at {ratio:.0f}x data); {flagged} flagged")

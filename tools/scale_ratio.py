#!/usr/bin/env python3
"""Per-query scaling-ratio report between two Bench JSON records.

Usage: python3 tools/scale_ratio.py <bench_lo.json> <bench_hi.json> <data_ratio>

Reads the first parseable JSON line with a "queries" map from each file and
prints every query's t_hi / t_lo ratio sorted descending, flagging ratios
above the data ratio (superlinear) — with a floor on t_lo so sub-50ms
fixed-overhead entries can't flag as superlinear on noise.
"""
import json, sys

def load(path):
    with open(path) as f:
        for line in f:
            try:
                j = json.loads(line)
                if "queries" in j:
                    return j
            except json.JSONDecodeError:
                continue
    sys.exit(f"no bench JSON line in {path}")

lo, hi, r = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
qlo, qhi = lo["queries"], hi["queries"]
FLOOR = 0.05
rows = []
for q in sorted(set(qlo) & set(qhi)):
    tl, th = qlo[q], qhi[q]
    ratio = th / max(tl, FLOOR)
    rows.append((ratio, q, tl, th))
rows.sort(reverse=True)
n_super = 0
for ratio, q, tl, th in rows:
    flag = ""
    if ratio > r and th > 0.5:
        flag = "  <-- SUPERLINEAR"
        n_super += 1
    print(f"{q:28s} {tl:8.3f} -> {th:8.3f} s  x{ratio:6.2f}{flag}")
print(f"\ntotal {lo.get('value', 0):.1f} -> {hi.get('value', 0):.1f} s at {r}x data; "
      f"{n_super} queries above the data ratio (with t_hi > 0.5s)")
missing = sorted(set(qlo) ^ set(qhi))
if missing:
    print(f"not in both: {missing}")

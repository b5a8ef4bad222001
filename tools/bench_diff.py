#!/usr/bin/env python3
"""Diff a graft.Bench JSON line against the standing per-query baseline.

Usage: bench_diff.py <bench.json> [baseline.json]

Exit 1 if any query regressed past 2x its baseline (the judge's gate),
with jitter floor: queries under 0.25 s in BOTH runs never flag.
"""
import json
import sys

bench = json.load(open(sys.argv[1]))
base = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BASELINE_QUERIES.json"))
bq, cq = base["queries"], bench["queries"]
bad = []
print(f"total: baseline={base['value']:.2f}s current={bench['value']:.2f}s "
      f"({bench['value']/base['value']:.2f}x)")
for q in sorted(cq):
    if q not in bq:
        print(f"  NEW  {q}: {cq[q]:.2f}s")
        continue
    r = cq[q] / bq[q] if bq[q] > 0 else float("inf")
    flag = r > 2.0 and (cq[q] > 0.25 or bq[q] > 0.25)
    if flag:
        bad.append(q)
    if flag or r > 1.5:
        print(f"  {'REGRESSED' if flag else 'warn     '} {q}: "
              f"{bq[q]:.2f}s -> {cq[q]:.2f}s ({r:.2f}x)")
for q in sorted(set(bq) - set(cq)):
    print(f"  GONE {q} (was {bq[q]:.2f}s)")
    bad.append(q)
print(f"{len(bad)} regression(s)" if bad else "within 2x of baseline everywhere")
sys.exit(1 if bad else 0)

#!/usr/bin/env python3
"""Append NEW queries to BASELINE_QUERIES.json from one or more bench runs.

Usage: baseline_add.py <bench1.json> [bench2.json ...]

Standing entries are never touched (re-baselining an existing query is a
deliberate, commit-documented act — see README); new queries take the MIN
across the given runs (the q159–q178 min-of-two precedent for contended
landing windows). The baseline's total is recomputed as the sum of its
per-query values.
"""
import json
import sys

base = json.load(open("BASELINE_QUERIES.json"))
runs = [json.load(open(p)) for p in sys.argv[1:]]
added = []
for q in sorted(runs[0]["queries"]):
    if q in base["queries"]:
        continue
    vals = [r["queries"][q] for r in runs if q in r["queries"]]
    base["queries"][q] = min(vals)
    added.append((q, min(vals)))
base["value"] = sum(base["queries"].values())
json.dump(base, open("BASELINE_QUERIES.json", "w"), indent=1, sort_keys=True)
for q, v in added:
    print(f"added {q}: {v:.3f}s")
print(f"total now {base['value']:.2f}s over {len(base['queries'])} queries")

#!/usr/bin/env python3
"""Build BENCH_rN_local.json as the per-query MIN across full sweeps
(the round-11 min-of-sweeps precedent: earlier sweeps lack queries added
later in the round; each query's min is over the sweeps containing its
final shape).

Usage: bench_local_build.py <out.json> <composed-note> <sweep1.json> [...]
"""
import json
import sys

out_path, note = sys.argv[1], sys.argv[2]
sweeps = [json.load(open(p)) for p in sys.argv[3:]]
queries = {}
for s in sweeps:
    for q, v in s["queries"].items():
        if q not in queries or v < queries[q]:
            queries[q] = v
doc = {
    "metric": "total",
    "value": sum(queries.values()),
    "unit": "sec",
    "queries": queries,
    "sf": sweeps[-1].get("sf", "/root/testdata/sf0.1"),
    "composed": note,
}
json.dump(doc, open(out_path, "w"))
print(f"{out_path}: {len(queries)} queries, total {doc['value']:.2f}s "
      f"(min over {len(sweeps)} sweeps)")

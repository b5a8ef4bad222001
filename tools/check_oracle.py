#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped code).

Runs DuckDB on every oracle_sql.json entry against the same parquet tables,
loads the Spark result parquet written by graft.Verify, and compares
schema + values. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 target/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 target/verify_out

With --subset, queries whose Spark result dir is absent are skipped
instead of FAILed — for subset Verify runs (third Verify arg), e.g.:

    sbt "runMain graft.Verify /root/testdata/sf0.01 target/verify_out q286,q287"
    python3 tools/check_oracle.py /root/testdata/sf0.01 target/verify_out --subset
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir, subset=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        if subset and not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:160]}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:160]}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns want={wcols} got={gcols}")
            n_fail += 1
            continue
        # dtype divergences are warnings: the driver may or may not be strict
        for c in wcols:
            wt = want.schema.field(c).type
            gt = got.schema.field(c).type
            if str(wt) != str(gt):
                print(f"  WARN {name}.{c}: dtype duckdb={wt} spark={gt}")
        wrows = [tuple(norm(r[c]) for c in wcols) for r in want.to_pylist()]
        grows = [tuple(norm(r[c]) for c in wcols) for r in got.to_pylist()]
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rowcount want={len(wrows)} got={len(grows)}")
            n_fail += 1
            continue
        if wrows != grows and sorted(map(repr, wrows)) == sorted(map(repr, grows)):
            print(f"  WARN {name}: rows equal as sets but ORDER differs")
        # compare as sets first (driver may sort); then positionally
        if sorted(map(repr, wrows)) != sorted(map(repr, grows)):
            bad = [(w, g) for w, g in zip(wrows, grows) if repr(w) != repr(g)][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            n_fail += 1
            continue
        print(f"ok   {name} ({len(wrows)} rows)")
        n_pass += 1
    skipped = f" / {n_skip} skipped (absent, --subset)" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skipped} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--subset"]
    sys.exit(main(args[0], args[1], subset="--subset" in sys.argv))

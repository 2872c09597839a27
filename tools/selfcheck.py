#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Reads each Spark result parquet under outDir/<name>/, runs the matching
oracle SQL from outDir/oracle_sql.json in DuckDB (tables = views over the
sfDir parquet files), sorts columns by name, and compares values exactly.
Development aid only — the real gate is driver-side.
"""
import sys, json, math, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v  # exact float compare
    return v

ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
        fail += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    wcols, gcols = sorted(want.column_names), sorted(got.column_names)
    if wcols != gcols:
        print(f"FAIL {name}: cols spark={gcols} oracle={wcols}")
        fail += 1
        continue
    wrows = [tuple(norm(r[c]) for c in wcols) for r in want.to_pylist()]
    grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
    if len(wrows) != len(grows):
        print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
        fail += 1
        continue
    bad = [(i, g, w) for i, (g, w) in enumerate(zip(grows, wrows)) if g != w]
    if bad:
        i, g, w = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(wrows)} rows differ; first row {i}:")
        print(f"  cols   {wcols}")
        print(f"  spark  {g}")
        print(f"  oracle {w}")
        fail += 1
    else:
        print(f"OK   {name} ({len(wrows)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

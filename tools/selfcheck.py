#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Round-1 lesson: the driver compares PANDAS frames (Spark parquet via
pyarrow->pandas vs DuckDB's .df()), sorts columns by name, sorts rows by
all columns, and hashes the values. That pipeline is sensitive to
REPRESENTATION, not just values:
  - DECIMAL columns: pyarrow keeps decimal.Decimal objects, DuckDB's
    .df() produces float64 -> hashes differ even when values are equal
    (15 red rows in round 1);
  - list columns: numpy ndarrays are unhashable -> sort_values crashes
    (m02 in round 1).
So this mirror reproduces that exact pipeline (sort_values + pandas
object hashing) instead of an arrow-level exact-value compare, and only
falls back to a value-level diff to EXPLAIN a hash mismatch.
Development aid only - the real gate is driver-side.
"""
import sys, json, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))


def canon(df):
    """Driver-style canonicalization: columns sorted by name, rows sorted
    by every column, index dropped. Raises on unsortable cell types
    (mirrors the driver's m02 crash)."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def frame_hash(df):
    """Hash of all values, driver-style (pandas object hashing)."""
    h = pd.util.hash_pandas_object(df, index=False)
    # hash per-column too so dtype differences in any column show up
    cols = {c: int(pd.util.hash_pandas_object(df[c], index=False).sum())
            for c in df.columns}
    return int(h.sum()), cols


def value_diff(got, want):
    """Exact value-level diff (debug aid when hashes mismatch)."""
    for i in range(len(want)):
        g = tuple(got.iloc[i])
        w = tuple(want.iloc[i])
        eq = all((a == b) or (pd.isna(a) and pd.isna(b))
                 if not isinstance(a, (list, tuple)) else list(a) == list(b)
                 for a, b in zip(g, w))
        if not eq:
            return i, g, w
    return None


ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        want = canon(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[-1]}")
        fail += 1
        continue
    try:
        got = canon(pd.read_parquet(files))
    except Exception as e:
        print(f"FAIL {name}: spark-side canon error: {str(e).splitlines()[-1]}")
        fail += 1
        continue
    if sorted(want.columns) != sorted(got.columns):
        print(f"FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
        fail += 1
        continue
    try:
        gh, gcols = frame_hash(got)
        wh, wcols = frame_hash(want)
    except Exception as e:
        print(f"FAIL {name}: hash error: {str(e).splitlines()[-1]}")
        fail += 1
        continue
    if gh != wh:
        badcols = [c for c in gcols if gcols[c] != wcols[c]]
        print(f"FAIL {name}: hash mismatch in cols {badcols} "
              f"(spark dtypes {[str(got[c].dtype) for c in badcols]}, "
              f"oracle dtypes {[str(want[c].dtype) for c in badcols]})")
        d = value_diff(got, want)
        if d:
            i, g, w = d
            print(f"  first value diff at row {i}:")
            print(f"  cols   {list(want.columns)}")
            print(f"  spark  {g}")
            print(f"  oracle {w}")
        else:
            print("  values are exactly equal -> representation-only mismatch "
                  "(dtype/object-vs-native). Fix the output schema.")
        fail += 1
    else:
        print(f"OK   {name} ({len(want)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Dev-loop mimic of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<query>/ parquet dirs + <outDir>/oracle_sql.json. Registers the
testdata parquet as DuckDB views, runs each oracle, and compares against the
Spark result (row count, column set, and value hash with rows+columns sorted).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing: datetimes -> iso str, floats -> rounded repr
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{out}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
        fails += 1
        continue
    g, w = canon(got), canon(want)
    eq = True
    for c in g.columns:
        gc, wc = g[c], w[c]
        if pd.api.types.is_float_dtype(gc) and pd.api.types.is_float_dtype(wc):
            ok = ((gc.isna() & wc.isna()) | (abs(gc - wc) <= 1e-9 + 1e-9 * abs(wc))).all()
        else:
            ok = gc.equals(wc)
        if not ok:
            diffs = (gc != wc)
            try:
                idx = diffs[diffs].index[:3].tolist()
                detail = [(i, gc[i], wc[i]) for i in idx]
            except Exception:
                detail = "?"
            print(f"FAIL {name}: column {c} mismatch, e.g. {detail}")
            eq = False
            break
    if eq:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)

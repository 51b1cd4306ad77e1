#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py [sfdir] [outdir]

Runs DuckDB on each oracle_sql.json entry (tables = parquet files in
sfdir), loads the Spark parquet dump from outdir/<name>, sorts columns
by name and rows by all columns, and compares cell-by-cell.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df

def cells_equal(a, b) -> bool:
    if (a is None or (isinstance(a, float) and math.isnan(a))) and \
       (b is None or (isinstance(b, float) and math.isnan(b))):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

ok_all = True
for name in sorted(oracle):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output");  ok_all = False;  continue
    try:
        ddf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}");  ok_all = False;  continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    ddf, sdf = canon(ddf), canon(sdf)
    if list(ddf.columns) != list(sdf.columns):
        print(f"FAIL {name}: cols duck={list(ddf.columns)} spark={list(sdf.columns)}")
        ok_all = False;  continue
    if len(ddf) != len(sdf):
        print(f"FAIL {name}: rows duck={len(ddf)} spark={len(sdf)}")
        ok_all = False;  continue
    bad = None
    for c in ddf.columns:
        dv, sv = ddf[c].tolist(), sdf[c].tolist()
        for i, (a, b) in enumerate(zip(dv, sv)):
            if not cells_equal(a, b):
                bad = (c, i, a, b);  break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: cell mismatch col={c} row={i} duck={a!r} spark={b!r}")
        ok_all = False
    else:
        print(f"OK   {name}: {len(ddf)} rows")

sys.exit(0 if ok_all else 1)

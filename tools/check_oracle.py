#!/usr/bin/env python3
"""Self-check replicating the driver's DuckDB correctness compare.

DRIVER KEY CONVENTION (round-1 lesson — do not change): correctness rows and
the oracle_sql.json lookup are keyed by the output DIRECTORY name, i.e.
"<query>.parquet". This script therefore globs {out}/{key}/*.parquet with the
key taken VERBATIM from oracle_sql.json — if Verify writes keys the driver
can't match, this script fails the same way the driver does.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir]
"""
import duckdb, json, glob, os, sys
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
oracle = json.load(open(f"{out}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(4)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for key, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out}/{key}/*.parquet")
    if not spark_files:
        fails.append((key, "no spark output dir matching oracle key")); continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        fails.append((key, f"oracle error: {e}")); continue
    try:
        s, o = canon(sdf.copy()), canon(odf.copy())
        if list(s.columns) != list(o.columns):
            fails.append((key, f"cols spark={list(s.columns)} oracle={list(o.columns)}")); continue
        if len(s) != len(o):
            fails.append((key, f"rows spark={len(s)} oracle={len(o)}")); continue
        if not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad = neq.any(axis=1)
            fails.append((key, f"value mismatch, {bad.sum()} rows, e.g.\nspark:\n{s[bad].head(3)}\noracle:\n{o[bad].head(3)}"))
            continue
        print(f"OK    {key} ({len(s)} rows)")
    except Exception as e:
        fails.append((key, f"compare error: {e}"))

rowsonly = set(os.path.basename(x) for x in glob.glob(f"{out}/q_*.parquet")) - set(oracle)
for key in sorted(rowsonly):
    fs = glob.glob(f"{out}/{key}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in fs) if fs else 0
    print(f"ROWS  {key}: {n} rows {'OK' if n > 0 else 'EMPTY!!'}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-checked queries pass")
for k, msg in fails:
    print(f"FAIL  {k}: {msg}")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate, replicating the
driver's PANDAS-based compare (not a fetchall() value compare):

  spark side  = pandas.read_parquet(<outdir>/<query>/)   (pyarrow)
  oracle side = duckdb.execute(sql).df()
  both        : columns sorted by name, rows sort_values over all
                columns, then a dtype-SENSITIVE row hash
                (pd.util.hash_pandas_object).

This means an int64 Spark column vs a float64 DuckDB HUGEINT-sum
column FAILS here even when the values are numerically identical —
exactly as the driver's gate behaves (round-3 lesson: 23 value-exact
queries were hash-red purely on dtype). Any dtype divergence is
reported explicitly so the offending cast can be fixed at the query.

Usage: python3 tools/verify_local.py [sfdir] [outdir]
(Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first; honors the
 SPARK_GRAFT_ONLY subset via the filtered oracle_sql.json it writes.)
"""
import sys, json, traceback
import duckdb
import numpy as np
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(df):
    """Mirror the driver: columns sorted by name, rows sorted by all
    columns (this is where array/unhashable columns crash, as they do
    driver-side), index dropped."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def row_hashes(df):
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    try:
        sdf = canon(pd.read_parquet(f"{outdir}/{name}"))
        odf = canon(con.execute(sql).df())
    except Exception:
        fails.append((name, "ERROR: " + traceback.format_exc(limit=3)
                      .strip().replace("\n", " | ")))
        continue
    if list(sdf.columns) != list(odf.columns):
        fails.append((name, f"schema mismatch: spark {list(sdf.columns)} "
                            f"vs oracle {list(odf.columns)}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"row count: spark {len(sdf)} vs oracle {len(odf)}"))
        continue
    dtype_diffs = [
        f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
        for c in sdf.columns if str(sdf[c].dtype) != str(odf[c].dtype)]
    try:
        hmatch = bool(np.array_equal(row_hashes(sdf), row_hashes(odf)))
    except Exception:
        fails.append((name, "ERROR hashing: " + traceback.format_exc(limit=2)
                      .strip().replace("\n", " | ")))
        continue
    # Dtype divergence is a FAIL even when the value hashes coincide:
    # int32 hashes like int64 in hash_pandas_object, and 0 hashes like
    # 0.0, but the driver's gate reds those (round-3 lesson —
    # mm_shard_manifest slipped through locally on all-zero shard ids).
    if hmatch and not dtype_diffs:
        passes += 1
        print(f"PASS {name} ({len(sdf)} rows)")
        continue
    if hmatch:
        fails.append((name, "dtype mismatch (values equal): "
                      + "; ".join(dtype_diffs)))
        continue
    # Diagnose: is it dtype-only (value-exact) or a real value diff?
    msg = "hash mismatch"
    if dtype_diffs:
        msg += "; DTYPE DIFFS: " + "; ".join(dtype_diffs)
    try:
        bad = np.where(row_hashes(sdf) != row_hashes(odf))[0][:3]
        for i in bad:
            msg += (f" | row{i} spark={tuple(sdf.iloc[i])} "
                    f"oracle={tuple(odf.iloc[i])}")
    except Exception:
        pass
    fails.append((name, msg))

for name, msg in fails:
    print(f"FAIL {name}: {msg[:800]}")
print(f"\n{passes} passed, {len(fails)} failed, {len(oracle)} total oracles")
sys.exit(1 if fails else 0)

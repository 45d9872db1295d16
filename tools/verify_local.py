#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output (parquet per query) against the DuckDB oracles in
oracle_sql.json over the same sf dir. Compares as multisets of rows
with columns sorted by name (mirrors the driver's sort-columns-then-
hash compare). Exact equality required; floats compared bitwise.

Usage: python3 tools/verify_local.py [sfdir] [outdir]
(Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first.)
"""
import sys, json, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    try:
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        gcols = [d[0] for d in got_rel.description]
        grows = got_rel.fetchall()
        exp_rel = con.execute(sql)
        ecols = [d[0] for d in exp_rel.description]
        erows = exp_rel.fetchall()
    except Exception as e:
        fails.append((name, f"ERROR: {e}"))
        continue
    gc, gr = canon(gcols, grows)
    ec, er = canon(ecols, erows)
    if gc != ec:
        fails.append((name, f"schema mismatch: got {gc} want {ec}"))
    elif gr != er:
        msg = f"rows differ: got {len(gr)} want {len(er)}"
        diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
        first_only = [r for r in gr if r not in set(er)][:3]
        msg += f"; first diffs {diff or first_only}"
        fails.append((name, msg))
    else:
        passes += 1
        print(f"PASS {name} ({len(gr)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{passes} passed, {len(fails)} failed, "
      f"{len(oracle)} total oracles")
sys.exit(1 if fails else 0)

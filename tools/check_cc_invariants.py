#!/usr/bin/env python3
"""Linear-cost validation of a connected-components dump when the
DuckDB transitive-closure oracle is infeasible.

At large sf the synthetic corpus's small vocabulary saturates the
8-shingle space and the banded-LSH candidate graph welds (sf1:
16.7M candidate pairs, one 62k-doc component). The engine side
(Dedup.connectedComponents — distributed min-label + pointer
jumping) completes fine; DuckDB's RECURSIVE closure oracle on that
shape is super-quadratic and cannot (it enumerates paths, not
labels). This script checks invariants that are linear in
|edges| + |nodes| per round instead:

  1. no candidate pair crosses two clusters (the partition is at
     least as coarse as true connectivity — catches UNDER-merging);
  2. every pair member carries a cluster verdict;
  3. every cluster's label is its minimum member id (canonical
     labels — the exact form the closure oracle would produce);
  4. a pointer-jumping min-label replay over the pair list, run to
     fixpoint (O(log diameter) rounds, each one linear join pass),
     must equal the dump EXACTLY. Checks 1-3 alone cannot detect
     OVER-merging (a broken CC that welds unrelated docs into one
     min-labeled mega-cluster passes all three); the converged
     replay is the true min-label partition, so label-for-label
     equality is a complete oracle for both failure directions.

Full RECURSIVE-closure equivalence remains gated at the sfs where
that oracle is feasible (sf0.01 / sf0.1, driver gate + local
harness); this replay reproduces the same canonical labels by a
different, scale-feasible algorithm.

Usage: check_cc_invariants.py <verify_out_dir>
"""
import sys
import duckdb

MAX_ROUNDS = 48  # path-halving: covers diameter ~2^48


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW cc AS SELECT * FROM '{out}/dedup_cc/*.parquet'")
    con.sql(f"CREATE VIEW pairs AS SELECT * FROM "
            f"'{out}/dedup_lsh_pairs/*.parquet'")
    cross = con.sql("""
      SELECT COUNT(*) FROM pairs p
      JOIN cc a ON a.doc_id = p.doc_a
      JOIN cc b ON b.doc_id = p.doc_b
      WHERE a.cluster_id <> b.cluster_id""").fetchone()[0]
    missing = con.sql("""
      SELECT COUNT(*) FROM (
        SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs) u
      LEFT JOIN cc ON cc.doc_id = u.d
      WHERE cc.doc_id IS NULL""").fetchone()[0]
    badlabel = con.sql("""
      SELECT COUNT(*) FROM (
        SELECT cluster_id, MIN(doc_id) AS m FROM cc
        GROUP BY cluster_id) t
      WHERE cluster_id <> m""").fetchone()[0]

    # --- check 4: min-label fixpoint replay (over-merge detector) ---
    con.sql("""
      CREATE TABLE edges AS
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs""")
    # init at min(self, neighbors): same first step as the engine
    con.sql("""
      CREATE TABLE labels AS
      SELECT src AS v, MIN(lbl) AS lbl FROM (
        SELECT src, src AS lbl FROM edges
        UNION ALL SELECT src, dst FROM edges) t
      GROUP BY src""")
    last = con.sql("SELECT SUM(lbl) FROM labels").fetchone()[0]
    rounds = 0
    converged = False
    while rounds < MAX_ROUNDS:
        con.sql("""
          CREATE OR REPLACE TABLE labels AS
          SELECT v, MIN(lbl) AS lbl FROM (
            SELECT v, lbl FROM labels
            UNION ALL           -- propagate across edges
            SELECT e.dst AS v, l.lbl
            FROM edges e JOIN labels l ON l.v = e.src
            UNION ALL           -- pointer jump: l(l(v))
            SELECT x.v, y.lbl
            FROM labels x JOIN labels y ON y.v = x.lbl) t
          GROUP BY v""")
        now = con.sql("SELECT SUM(lbl) FROM labels").fetchone()[0]
        rounds += 1
        if now == last:         # labels only decrease: stable sum = fixpoint
            converged = True
            break
        last = now
    mismatch = con.sql("""
      SELECT COUNT(*) FROM labels l
      FULL JOIN cc ON cc.doc_id = l.v
      WHERE cc.doc_id IS NULL OR l.v IS NULL
         OR cc.cluster_id <> l.lbl""").fetchone()[0]
    n_dump = con.sql("SELECT COUNT(DISTINCT cluster_id) FROM cc").fetchone()[0]
    n_replay = con.sql("SELECT COUNT(DISTINCT lbl) FROM labels").fetchone()[0]

    print(f"cross-cluster pairs: {cross} | members missing: {missing} "
          f"| non-minimal labels: {badlabel}")
    print(f"replay: converged={converged} rounds={rounds} "
          f"clusters dump={n_dump} replay={n_replay} "
          f"label mismatches={mismatch}")
    ok = (cross == 0 and missing == 0 and badlabel == 0
          and converged and mismatch == 0)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

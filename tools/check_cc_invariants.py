#!/usr/bin/env python3
"""Linear-cost validation of a connected-components dump when the
DuckDB transitive-closure oracle is infeasible.

At large sf the synthetic corpus's small vocabulary saturates the
8-shingle space and the banded-LSH candidate graph welds (sf1:
16.7M candidate pairs, one 62k-doc component). The engine side
(Dedup.connectedComponents — distributed min-label + pointer
jumping) completes fine; DuckDB's RECURSIVE closure oracle on that
shape is super-quadratic and cannot. This script checks the
invariants that are linear in |edges| + |nodes| instead:

  1. no candidate pair crosses two clusters (the partition is at
     least as coarse as true connectivity);
  2. every pair member carries a cluster verdict;
  3. every cluster's label is its minimum member id (canonical
     labels — the exact form the closure oracle would produce).

Full closure equivalence remains gated at the sfs where the oracle
is feasible (sf0.01 / sf0.1, driver gate + local harness).

Usage: check_cc_invariants.py <verify_out_dir>
"""
import sys
import duckdb

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
    print(f"cross-cluster pairs: {cross} | members missing: {missing} "
          f"| non-minimal labels: {badlabel}")
    ok = cross == 0 and missing == 0 and badlabel == 0
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1

if __name__ == "__main__":
    sys.exit(main())

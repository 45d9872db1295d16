#!/usr/bin/env python3
"""Linear-cost validation of the sim_knn_graph / sim_hubness_audit
dumps at scales where their DuckDB oracles are infeasible (round-5
verdict item 4 — the oracles are label-blocked self-joins, quadratic
in block size, and sf1 blocks are too large for the gate).

Checks (each linear in |edges| + |nodes|, except 7 which is
sample x block):

  1. no self loops;
  2. every edge stays inside its label block;
  3. per-source out-degree == min(k, block_size - 1) and ranks are
     exactly 1..deg (k = 3);
  4. the hubness histogram PARTITIONS the corpus: sum(n_nodes) ==
     |embeddings| (including the in_deg = 0 antihub row);
  5. degree sum: sum(in_deg * n_nodes) == |knn edges|;
  6. the histogram equals the histogram derived independently from
     the knn dump (cross-dump consistency, antihub row included);
  7. sampled exactness: for the 4 smallest vec_ids of every label,
     replay the EXACT scoring (integer-quantized dot
     sum(floor(a_i*b_i*1e9)) -> cos -> ORDER BY cos DESC,
     neighbor_id) over the full block and require the dumped
     (rank, neighbor) pairs to match. dotQ is exact integer, so no
     summation-order caveat applies.

Usage: check_sim_invariants.py <verify_out_dir> <sfdir>
"""
import sys
import duckdb

K = 3
SAMPLE_PER_LABEL = 4


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW knn AS SELECT * FROM "
            f"'{out}/sim_knn_graph/*.parquet'")
    con.sql(f"CREATE VIEW hub AS SELECT * FROM "
            f"'{out}/sim_hubness_audit/*.parquet'")
    con.sql(f"CREATE VIEW emb AS SELECT * FROM "
            f"read_parquet('{sfdir}/embeddings.parquet')")

    # Derive the embedding dimension from the corpus (never hardcode:
    # a testdata regeneration with a new dim must error here, not
    # silently score a prefix) and require it uniform.
    dmin, dmax = con.sql(
        "SELECT MIN(len(embedding)), MAX(len(embedding)) FROM emb"
    ).fetchone()
    if dmin != dmax:
        print(f"FAIL: non-uniform embedding dims [{dmin}, {dmax}]")
        return 1
    dim = int(dmin)

    self_loops = con.sql(
        "SELECT COUNT(*) FROM knn WHERE vec_id = neighbor_id").fetchone()[0]
    cross_block = con.sql("""
      SELECT COUNT(*) FROM knn j
      JOIN emb a ON a.vec_id = j.vec_id
      JOIN emb b ON b.vec_id = j.neighbor_id
      WHERE a.label <> b.label""").fetchone()[0]
    bad_degree = con.sql(f"""
      WITH bs AS (SELECT label, COUNT(*) AS n FROM emb GROUP BY label),
      deg AS (
        SELECT j.vec_id, COUNT(*) AS d, MIN(rk) AS rmin, MAX(rk) AS rmax,
               COUNT(DISTINCT rk) AS nrk
        FROM knn j GROUP BY j.vec_id)
      SELECT COUNT(*) FROM deg
      JOIN emb e ON e.vec_id = deg.vec_id
      JOIN bs ON bs.label = e.label
      WHERE d <> least({K}, bs.n - 1)
         OR rmin <> 1 OR rmax <> d OR nrk <> d""").fetchone()[0]
    n_corpus = con.sql("SELECT COUNT(*) FROM emb").fetchone()[0]
    hist_total = con.sql("SELECT SUM(n_nodes) FROM hub").fetchone()[0]
    n_edges = con.sql("SELECT COUNT(*) FROM knn").fetchone()[0]
    deg_sum = con.sql(
        "SELECT SUM(in_deg * n_nodes) FROM hub").fetchone()[0]
    hist_mismatch = con.sql("""
      WITH indeg AS (
        SELECT neighbor_id, COUNT(*) AS d FROM knn GROUP BY neighbor_id),
      derived AS (
        SELECT d AS in_deg, COUNT(*) AS n_nodes FROM indeg GROUP BY d
        UNION ALL
        SELECT 0, (SELECT COUNT(*) FROM emb) -
                  (SELECT COUNT(*) FROM indeg)
        WHERE (SELECT COUNT(*) FROM emb) > (SELECT COUNT(*) FROM indeg))
      SELECT COUNT(*) FROM derived d
      FULL JOIN hub h ON h.in_deg = d.in_deg
      WHERE h.in_deg IS NULL OR d.in_deg IS NULL
         OR h.n_nodes <> d.n_nodes""").fetchone()[0]

    # 7: sampled exact replay of the quantized-cosine top-k
    sample_bad = con.sql(f"""
      WITH q AS (
        SELECT vec_id, label, embedding FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY label
            ORDER BY vec_id) AS rn FROM emb) t
        WHERE rn <= {SAMPLE_PER_LABEL}),
      nrm AS (
        SELECT vec_id,
          (SELECT SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) *
             CAST(embedding[i] AS DOUBLE) * 1000000000.0) AS BIGINT))
           FROM generate_series(1, {dim}) t(i)) AS qn
        FROM emb),
      scored AS (
        SELECT q.vec_id, b.vec_id AS neighbor_id,
          CAST((SELECT SUM(CAST(floor(CAST(q.embedding[i] AS DOUBLE) *
             CAST(b.embedding[i] AS DOUBLE) * 1000000000.0) AS BIGINT))
           FROM generate_series(1, {dim}) t(i)) AS DOUBLE) /
          (sqrt(CAST(na.qn AS DOUBLE)) * sqrt(CAST(nb.qn AS DOUBLE)))
            AS cos
        FROM q JOIN emb b ON b.label = q.label AND b.vec_id <> q.vec_id
        JOIN nrm na ON na.vec_id = q.vec_id
        JOIN nrm nb ON nb.vec_id = b.vec_id),
      truth AS (
        SELECT vec_id, neighbor_id, rk FROM (
          SELECT vec_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, neighbor_id) AS rk
          FROM scored) t WHERE rk <= {K})
      SELECT COUNT(*) FROM truth t
      FULL JOIN (SELECT j.* FROM knn j JOIN q ON q.vec_id = j.vec_id) d
        ON d.vec_id = t.vec_id AND d.rk = t.rk
      WHERE d.vec_id IS NULL OR t.vec_id IS NULL
         OR d.neighbor_id <> t.neighbor_id""").fetchone()[0]

    print(f"self loops: {self_loops} | cross-block edges: {cross_block} "
          f"| bad degrees/ranks: {bad_degree}")
    print(f"corpus {n_corpus} vs histogram total {hist_total} | "
          f"edges {n_edges} vs degree sum {deg_sum} | "
          f"histogram mismatches: {hist_mismatch}")
    print(f"sampled top-{K} replay mismatches: {sample_bad}")
    ok = (self_loops == 0 and cross_block == 0 and bad_degree == 0
          and hist_total == n_corpus and deg_sum == n_edges
          and hist_mismatch == 0 and sample_bad == 0)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

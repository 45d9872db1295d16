#!/usr/bin/env python3
"""Independent validation of the four graph dumps whose DuckDB oracles
are infeasible at sf1 (round-6 verdict item 2): gr_pagerank,
gr_personalized_ppr, gr_kcore, gr_modularity.

The registry oracles replay the fixed-round iterations as one deep
unrolled-CTE query; at sf1 DuckDB materializes the whole pipeline at
once and OOMs (gr_pagerank, gr_kcore) or stalls in spill
(gr_modularity, gr_personalized_ppr). This checker replays the SAME
integer arithmetic ROUND BY ROUND, materializing each round into a
temp table — every step is linear in |edges|, so the total cost is
O(rounds * edges) with bounded memory. Because the replay reproduces
the full query semantics (not just invariants), the compare is
label-for-label / row-for-row exact — a complete oracle, same
standing as tools/check_cc_invariants.py's fixpoint replay.

All arithmetic is integer (micro-rank units, `//` on positives ==
Spark `div`), so the replay is bit-exact by construction; the one
double output (modularity) is a single correctly-rounded division of
two exact integers, recomputed in Python and compared bit-exactly.

Usage: check_graph_invariants.py <verify_out_dir> <sfdir>
Env:   MEMLIMIT (e.g. '24GB') caps DuckDB memory.
"""
import os
import sys
import duckdb

UNIT_TOTAL = 10 ** 12  # micro-rank: 1.0 == 10^12 (Graph.scala:16)
ROUNDS = 3             # pagerank / ppr fixed rounds
KCORE_K = 3
KCORE_ROUNDS = 4


def fetch(con, sql):
    return con.sql(sql).fetchall()


def check_ordered(name, got, want):
    ok = got == want
    print(f"{name}: replay rows {len(want)} vs dump rows {len(got)} -> "
          f"{'PASS' if ok else 'FAIL'}")
    if not ok:
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                print(f"  first diff at row {i}: dump={g} replay={w}")
                break
        if len(got) != len(want):
            print(f"  length mismatch: dump {len(got)} replay {len(want)}")
    return ok


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
    con = duckdb.connect()
    mem = os.environ.get("MEMLIMIT")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    for t in ("lineitem", "orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
    ok = True

    # ---- interaction graph (customer 2k <-> supplier 2k+1) ----------
    con.sql("""CREATE TABLE ie AS
      SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey""")
    con.sql("""CREATE TABLE iedges AS
      SELECT src, dst FROM ie UNION ALL SELECT dst, src FROM ie""")
    con.sql("""CREATE TABLE ideg AS
      SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM iedges GROUP BY src""")
    con.sql("""CREATE TABLE iem AS
      SELECT e.src, e.dst, d.outdeg FROM iedges e JOIN ideg d USING (src)""")

    # ---- gr_pagerank: 3 integer rounds, materialized per round ------
    n = fetch(con, "SELECT COUNT(*) FROM ideg")[0][0]
    unit = UNIT_TOTAL // max(n, 1)
    base = (15 * unit) // 100
    con.sql(f"CREATE TABLE pr_r0 AS SELECT src AS id, "
            f"CAST({unit} AS BIGINT) AS r FROM ideg")
    for i in range(1, ROUNDS + 1):
        con.sql(f"""CREATE TABLE pr_c{i} AS
          SELECT e.dst AS id, CAST(SUM(r.r // e.outdeg) AS BIGINT) AS c
          FROM iem e JOIN pr_r{i-1} r ON e.src = r.id GROUP BY e.dst""")
        con.sql(f"""CREATE TABLE pr_r{i} AS
          SELECT p.id, {base} + (85 * COALESCE(c.c, 0)) // 100 AS r
          FROM pr_r{i-1} p LEFT JOIN pr_c{i} c USING (id)""")
    want = fetch(con, f"""
      SELECT id, CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END,
             CAST(r AS BIGINT)
      FROM pr_r{ROUNDS} ORDER BY r DESC, id LIMIT 30""")
    got = fetch(con, f"""
      SELECT node_id, kind, rank3 FROM '{out}/gr_pagerank/*.parquet'
      ORDER BY rank3 DESC, node_id""")
    ok &= check_ordered("gr_pagerank", got, want)

    # ---- gr_personalized_ppr: seeds = nation-0 customers ------------
    con.sql("""CREATE TABLE seeds AS
      SELECT DISTINCT c_custkey*2 AS id FROM customer
      WHERE c_nationkey = 0""")
    con.sql("""CREATE TABLE pnodes AS
      SELECT d.src AS id,
        CASE WHEN s.id IS NULL THEN 0 ELSE 1 END AS is_seed
      FROM ideg d LEFT JOIN seeds s ON s.id = d.src""")
    ns = fetch(con, "SELECT SUM(is_seed) FROM pnodes")[0][0] or 0
    punit = UNIT_TOTAL // max(ns, 1)
    pbase = (15 * punit) // 100
    con.sql(f"CREATE TABLE ppr_r0 AS SELECT id, "
            f"CAST(is_seed * {punit} AS BIGINT) AS r FROM pnodes")
    for i in range(1, ROUNDS + 1):
        con.sql(f"""CREATE TABLE ppr_c{i} AS
          SELECT e.dst AS id, CAST(SUM(r.r // e.outdeg) AS BIGINT) AS c
          FROM iem e JOIN (SELECT * FROM ppr_r{i-1} WHERE r > 0) r
            ON e.src = r.id GROUP BY e.dst""")
        con.sql(f"""CREATE TABLE ppr_r{i} AS
          SELECT p.id,
            p.is_seed * {pbase} + (85 * COALESCE(c.c, 0)) // 100 AS r
          FROM pnodes p LEFT JOIN ppr_c{i} c USING (id)""")
    want = fetch(con, f"""
      SELECT id, CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END,
             CAST(r AS BIGINT)
      FROM ppr_r{ROUNDS} WHERE r > 0 ORDER BY r DESC, id LIMIT 30""")
    got = fetch(con, f"""
      SELECT node_id, kind, ppr3 FROM '{out}/gr_personalized_ppr/*.parquet'
      ORDER BY ppr3 DESC, node_id""")
    ok &= check_ordered("gr_personalized_ppr", got, want)

    # ---- co-purchase graph (support >= 2 part pairs) -----------------
    con.sql("""CREATE TABLE cp AS
      SELECT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2""")
    con.sql("""CREATE TABLE kc_e0 AS
      SELECT a AS src, b AS dst FROM cp
      UNION ALL SELECT b AS src, a AS dst FROM cp""")

    # ---- gr_kcore: 4 peel rounds, materialized per round ------------
    for i in range(1, KCORE_ROUNDS + 1):
        con.sql(f"""CREATE TABLE kc_k{i} AS
          SELECT src AS v FROM kc_e{i-1} GROUP BY src
          HAVING COUNT(*) >= {KCORE_K}""")
        con.sql(f"""CREATE TABLE kc_e{i} AS
          SELECT e.src, e.dst FROM kc_e{i-1} e
          JOIN kc_k{i} ka ON e.src = ka.v
          JOIN kc_k{i} kb ON e.dst = kb.v""")
    want = fetch(con, f"""
      SELECT src, CAST(COUNT(*) AS BIGINT) FROM kc_e{KCORE_ROUNDS}
      GROUP BY src ORDER BY src""")
    got = fetch(con, f"""
      SELECT node_id, deg FROM '{out}/gr_kcore/*.parquet'
      ORDER BY node_id""")
    ok &= check_ordered("gr_kcore", got, want)

    # ---- gr_modularity: 2 min-label rounds + exact-integer formula --
    con.sql("""CREATE TABLE lp_l0 AS
      SELECT DISTINCT src AS v, src AS lbl FROM kc_e0""")
    for i in (1, 2):
        con.sql(f"""CREATE TABLE lp_l{i} AS
          SELECT v, MIN(lbl) AS lbl FROM (
            SELECT v, lbl FROM lp_l{i-1}
            UNION ALL
            SELECT e.dst AS v, l.lbl
            FROM kc_e0 e JOIN lp_l{i-1} l ON e.src = l.v) u GROUP BY v""")
    nc, m, w, sum_dc2 = fetch(con, """
      WITH ann AS (
        SELECT ls.lbl AS sl, ld.lbl AS dl FROM kc_e0 e
        JOIN lp_l2 ls ON e.src = ls.v JOIN lp_l2 ld ON e.dst = ld.v),
      degc AS (
        SELECT l.lbl, CAST(SUM(dc.deg) AS BIGINT) AS d_c
        FROM (SELECT src, COUNT(*) AS deg FROM kc_e0 GROUP BY src) dc
        JOIN lp_l2 l ON dc.src = l.v GROUP BY l.lbl)
      SELECT (SELECT COUNT(*) FROM degc),
             (SELECT COUNT(*) FROM ann),
             (SELECT COUNT(CASE WHEN sl = dl THEN 1 END) FROM ann),
             (SELECT CAST(SUM(d_c * d_c) AS BIGINT) FROM degc)""")[0]
    q_num = w * m - sum_dc2
    want = [(nc, m, w, q_num, float(q_num) / float(m * m))]
    got = fetch(con, f"""
      SELECT n_communities, m_directed, n_within, q_num, modularity
      FROM '{out}/gr_modularity/*.parquet'""")
    ok &= check_ordered("gr_modularity", got, want)

    # ---- gr_local_clustering: per-node triangle replay --------------
    # The DuckDB oracle's wedge join spills past the disk at sf1 (the
    # oriented-wedge intermediate is super-linear); this replay builds
    # the same support-thresholded co-purchase pairs in DuckDB (cheap —
    # the other gr_ oracles run it) and counts per-node triangles in
    # adjacency sets: for each edge, every common neighbor c gains one
    # triangle — each triangle increments each member exactly once.
    # All outputs are exact integers (cc_ppm is one integer division),
    # so the compare is row-for-row equality. Reuses the `cp` pair
    # table the kcore section already materialized.
    edges = fetch(con, "SELECT a, b FROM cp")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in edges:
        sa, sb = adj[a], adj[b]
        if len(sa) > len(sb):
            sa, sb = sb, sa
        for cmn in sa:
            if cmn in sb:
                tri[cmn] += 1
    want = sorted(
        (v, len(nb), tri[v], tri[v] * 2000000 // (len(nb) * (len(nb) - 1)))
        for v, nb in adj.items() if len(nb) >= 2)
    got = sorted(fetch(con, f"""
      SELECT node_id, deg, n_tri, cc_ppm
      FROM '{out}/gr_local_clustering/*.parquet'"""))
    ok &= check_ordered("gr_local_clustering", got, want)

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Graph analytics over relationally-derived graphs — the two shapes
  * a warehouse actually runs without a dedicated graph engine:
  * fixed-round PageRank (influence/centrality over an interaction
  * graph) and triangle counting (community density). Iterative
  * min-label propagation (connected components) already lives in
  * [[Dedup.connectedComponents]]; these add the numeric-iteration
  * and the wedge-closure patterns.
  *
  * Determinism: PageRank is computed entirely in integer micro-rank
  * units (rank 1.0 ≡ 10¹²). Per-edge contribution is `rank div
  * outdeg`, damping is `base + (85·Σ) div 100` — every step is
  * integer division and integer addition, so the result is
  * bit-identical under any partial-aggregation order, any partition
  * count, and in DuckDB (whose `//` matches `div` on positives).
  * A floating PageRank would flutter by ulps between engines.
  *
  * Scale posture: each PageRank iteration is one join (ranks ⋈ edges
  * on src) plus one aggregation (Σ contributions by dst) — the
  * Pregel message round expressed relationally. The rank frame is
  * node-sized, so the round join BROADCASTS ranks and the cached
  * edge frame never shuffles; the per-dst sum is map-side combined
  * into node-sized partials. Beyond broadcastable node counts (10⁹
  * nodes) the round becomes the SHUFFLE_HASH join + lineage-cut loop
  * that Dedup.connectedComponents already implements. Edge and rank
  * frames are pinned (persist + LogicalRDD lineage cut) because an
  * unrolled 3-round plan references each round's output twice — an
  * uncut lineage re-derives the edge build 2^rounds times (observed
  * 13 s → ~2 s at sf0.1).
  *
  * Triangle counting first thresholds the co-purchase graph on
  * support (pairs co-occurring in ≥2 orders) — the association-rule
  * move that removes the quadratic noise floor — then orients each
  * surviving edge from its (degree, id)-smaller endpoint, bounding
  * per-node out-degree by O(√m) and wedge work by O(m^1.5) on any
  * skew. Orientation follows the SAME total order used to order
  * wedge endpoints, so a wedge's closing edge has exactly one
  * storable direction and closure is a pure equi-join (an OR-of-
  * directions condition would force a nested-loop join).
  */
object GraphOps {

  /** persist + lineage cut (same pattern as Dedup.connectedComponents):
    * the LogicalRDD leaf is computed once and cached however many
    * times the unrolled plan references it. */
  private def pin(df: DataFrame): DataFrame = {
    val cut = df.sparkSession.createDataFrame(df.rdd, df.schema)
    cut.persist()
    cut
  }

  /** Undirected bipartite interaction graph from the testdata star
    * schema: customer ↔ supplier whenever a lineitem links them.
    * Ids are parity-disambiguated (customer 2k, supplier 2k+1). */
  private def interactionEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e0 = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
  }

  private val prOracle = {
    // One iteration of the integer PageRank as a CTE pair; unrolled
    // three times below (DuckDB `//` = Spark `div` on positives).
    def iter(i: Int) = s"""
        c$i AS (
          SELECT e.dst AS id, SUM(r.r // e.outdeg) AS c
          FROM em e
          JOIN r${i - 1} r ON e.src = r.id
          GROUP BY e.dst),
        r$i AS (
          SELECT p.id, nn.base + (85 * COALESCE(c$i.c, 0)) // 100 AS r
          FROM r${i - 1} p LEFT JOIN c$i ON p.id = c$i.id, nn)"""
    s"""WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        edges AS (
          SELECT src, dst FROM e0
          UNION ALL SELECT dst AS src, src AS dst FROM e0),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        em AS (SELECT e.src, e.dst, d.outdeg
               FROM edges e JOIN deg d ON e.src = d.src),
        nn AS (
          SELECT 1000000000000 // COUNT(*) AS unit,
                 (15 * (1000000000000 // COUNT(*))) // 100 AS base
          FROM deg),
        r0 AS (SELECT src AS id, nn.unit AS r FROM deg, nn),
        ${iter(1)},
        ${iter(2)},
        ${iter(3)}
        SELECT id AS node_id,
          CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
          r AS rank3
        FROM r3 ORDER BY rank3 DESC, node_id LIMIT 30"""
  }

  /** Fixed-round integer PageRank over a symmetric edge list
    * (src, dst). Returns (id, r) with r in micro-rank units
    * (1.0 ≡ 10¹²). See the object scaladoc for the determinism and
    * scale reasoning.
    */
  def pagerank(edges0: DataFrame, rounds: Int = 3): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    val edges = pin(edges0)
    val deg0 = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    // Edge frame with the sender's out-degree attached — the only
    // big table; pinned, scanned once per round, never shuffled.
    val em = pin(edges
      .join(broadcast(deg0.withColumnRenamed("src", "dsrc")),
        col("src") === col("dsrc"))
      .select($"src", $"dst", $"outdeg"))
    // One scalar pre-pass (node count) — same two-pass shape as
    // the broadcast-median queries; 1 job, 1 row to the driver.
    val n = deg0.count()
    val unit = 1000000000000L / math.max(n, 1L)
    val base = (15L * unit) / 100L
    var ranks = pin(deg0.select($"src".as("id"))
      .withColumn("r", lit(unit)))
    for (_ <- 1 to rounds) {
      val contrib = em
        .join(broadcast(ranks), $"src" === $"id")
        .groupBy($"dst")
        .agg(sum(expr("r div outdeg")).as("c"))
      ranks = pin(ranks.select($"id")
        .join(broadcast(contrib), $"id" === $"dst", "left")
        .select($"id",
          (lit(base) + expr("(85 * coalesce(c, 0L)) div 100")).as("r")))
    }
    ranks
  }

  /** Exact triangle count of an undirected simple graph given as
    * distinct (a, b) pairs with a < b. Returns one row
    * (n_triangles, n_edges, n_nodes). See the object scaladoc for
    * the degree-orientation reasoning.
    */
  def triangleCount(pairs0: DataFrame): DataFrame = {
    val s = pairs0.sparkSession
    import s.implicits._
    val pairs = pin(pairs0)
    val deg = pairs.select($"a".as("v")).unionAll(pairs.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    // Orient u→w from the (degree, id)-smaller endpoint; carry
    // w's (deg, id) so wedge endpoints can be ordered by the SAME
    // total order (making the closure probe a pure equi-join).
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = pin(pairs
      .join(deg.select($"v".as("va"), $"deg".as("da")), $"a" === $"va")
      .join(deg.select($"v".as("vb"), $"deg".as("db")), $"b" === $"vb")
      .select(
        when(aFirst, $"a").otherwise($"b").as("u"),
        when(aFirst, $"b").otherwise($"a").as("w"),
        when(aFirst, $"db").otherwise($"da").as("wdeg")))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.wdeg") < col("e2.wdeg") ||
            (col("e1.wdeg") === col("e2.wdeg") &&
              col("e1.w") < col("e2.w"))))
      .select(col("e1.w").as("x"), col("e2.w").as("y"))
    val closed = wedges.join(oriented.as("e3"),
      col("x") === col("e3.u") && col("y") === col("e3.w"))
    val nEdges = pairs.agg(count(lit(1)).as("n_edges"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    closed.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(nEdges).crossJoin(nNodes)
  }

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Fixed-round integer PageRank over the customer↔supplier graph.
    Q("gr_pagerank",
      (s, d) => {
        import s.implicits._
        pagerank(interactionEdges(s, d))
          .select($"id".as("node_id"),
            when($"id" % 2 === 0, "customer").otherwise("supplier").as("kind"),
            $"r".as("rank3"))
          .orderBy($"rank3".desc, $"node_id")
          .limit(30)
      },
      Some(prOracle)),

    // ------------------------------------------------------------------
    // Triangle counting on the support-thresholded part co-purchase
    // graph (parts appearing together in >= 2 distinct orders).
    Q("gr_triangle_count",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey")
        val pairs = li
          .join(li.select($"l_orderkey".as("ok2"), $"l_partkey".as("pk2")),
            $"l_orderkey" === $"ok2" && $"l_partkey" < $"pk2")
          .groupBy($"l_partkey".as("a"), $"pk2".as("b"))
          .agg(count(lit(1)).as("support"))
          .filter($"support" >= 2)
          .select($"a", $"b")
        triangleCount(pairs)
      },
      Some("""WITH pairs AS (
          SELECT l1.l_partkey AS a, l2.l_partkey AS b
          FROM lineitem l1 JOIN lineitem l2
            ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        deg AS (
          SELECT v, COUNT(*) AS deg FROM (
            SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs)
          GROUP BY v),
        oriented AS (
          SELECT CASE WHEN da.deg < db.deg
                        OR (da.deg = db.deg AND a < b) THEN a ELSE b END AS u,
                 CASE WHEN da.deg < db.deg
                        OR (da.deg = db.deg AND a < b) THEN b ELSE a END AS w,
                 CASE WHEN da.deg < db.deg
                        OR (da.deg = db.deg AND a < b) THEN db.deg
                      ELSE da.deg END AS wdeg
          FROM pairs
          JOIN deg da ON a = da.v
          JOIN deg db ON b = db.v),
        wedges AS (
          SELECT e1.w AS x, e2.w AS y
          FROM oriented e1 JOIN oriented e2
            ON e1.u = e2.u AND (e1.wdeg < e2.wdeg
              OR (e1.wdeg = e2.wdeg AND e1.w < e2.w))),
        closed AS (
          SELECT 1 FROM wedges JOIN oriented e3
            ON x = e3.u AND y = e3.w)
        SELECT (SELECT COUNT(*) FROM closed) AS n_triangles,
               (SELECT COUNT(*) FROM pairs) AS n_edges,
               (SELECT COUNT(*) FROM deg) AS n_nodes"""))
  )
}

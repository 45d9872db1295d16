package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Second tier of relational coverage: CUBE grouping sets, exact
  * percentiles, cross-table joins between the text and vector
  * corpora, and approximate aggregates (HLL — verified by tolerance
  * spec rather than oracle, since sketch internals are engine-
  * specific).
  */
object Advanced {

  private def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(27, scale))).cast("double")

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // CUBE: all 4 grouping-set combinations.
    Q("rel_cube_status",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
               dsum($"o_totalprice", 2).as("total"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // ------------------------------------------------------------------
    // Exact interpolated percentiles (both engines: linear
    // interpolation over the sorted set — deterministic doubles).
    // Exact percentiles (hash-comparable with DuckDB quantile_cont).
    // The exact aggregate buffers a value→count map per group on the
    // final reducer — correct here because group count is tiny and
    // value domains are bounded; a 100 TB pipeline with wide domains
    // should use approx_percentile (t-digest, mergeable partials,
    // bounded memory) and give up bit-exactness.
    Q("rel_percentiles",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
            expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
      },
      Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS median_qty,
        quantile_cont(l_extendedprice, 0.25) AS p25_price,
        quantile_cont(l_extendedprice, 0.75) AS p75_price
        FROM lineitem GROUP BY l_returnflag""")),

    // ------------------------------------------------------------------
    // Cross-corpus equi-join: documents ↔ embeddings on id
    // (SURVEY.md §2.3's doc↔embedding join), text stats × label.
    Q("rel_doc_embedding_join",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        docs.join(emb, docs("doc_id") === emb("vec_id"))
          .groupBy($"lang", $"label")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_chars").as("sum_chars"))
      },
      Some("""SELECT lang, label, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents JOIN embeddings ON doc_id = vec_id
        GROUP BY lang, label""")),

    // ------------------------------------------------------------------
    // Approximate distinct (HLL sketch) — engine-specific internals,
    // so no oracle; AdvancedSpec pins relative error ≤ 5% vs exact.
    Q("rel_approx_distinct",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
               approx_count_distinct($"l_partkey", 0.02).as("approx_parts"))
      },
      None)
  )
}

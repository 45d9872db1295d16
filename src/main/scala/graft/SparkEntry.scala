package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered as [[Q]] values by the operator modules and
  * assembled here; every entry with an oracle is hash-compared against
  * DuckDB by the driver (Verify), and timed per-round (Bench).
  */
object SparkEntry {

  /** Full registry, in stable declaration order. */
  val registry: Seq[Q] =
    core.Relational.all ++
    core.Advanced.all ++
    core.Advanced.all2 ++
    core.Advanced.all3 ++
    core.TpchFinal.all ++
    core.Lifecycle.all ++
    ext.EventsOps.all ++
    ext.EventsOps.all2 ++
    ext.EventsOps.all3 ++
    ext.TextAnalysis.all ++
    ext.TextAnalysis.all2 ++
    ext.TextAnalysis.all3 ++
    ext.Dedup.all ++
    ext.Dedup.all2 ++
    ext.Similarity.all ++
    ext.Multimodal.all ++
    ext.Multimodal.all2 ++
    ext.Multimodal.all3 ++
    ext.GraphOps.all ++
    ext.GraphOps.all2 ++
    ext.GraphOps.all3 ++
    ext.GraphOps.all4 ++
    ext.PipelineOps.all ++
    ext.LakeOps.all ++
    ext.LakeOps.all2 ++
    parity.ParityQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("rel_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(registry.map(q => q.name -> q.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(registry.collect { case Q(n, _, Some(sql)) => n -> sql }: _*)
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Audit main (not part of the driver contract): reports every
  * registered query whose INITIAL physical plan contains a
  * WindowExec with an empty partition spec — the "Moving all data
  * to a single partition" shape. Every hit must be a deliberately
  * tiny frame. NOTE: a constant partition key does NOT suppress the
  * shape — Spark 4's EliminateWindowPartitions strips foldable
  * partition expressions — so the benign sites still appear here
  * (and still WARN in bench logs). The enforced guarantee is
  * WindowAuditSpec's documented-tiny allowlist; this main is the
  * ad-hoc inspection tool for it.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def unpartitioned(p: SparkPlan): Seq[String] = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        w.windowExpression.map(_.sql).mkString("; ").take(120)
      case a: AdaptiveSparkPlanExec => // initial plan, pre-execution
        unpartitioned(a.initialPlan).mkString(" | ")
    }.filter(_.nonEmpty)
    var hits = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val bad = unpartitioned(fn(spark, sfDir).queryExecution.executedPlan)
        if (bad.nonEmpty) { hits += 1; println(s"UNPARTITIONED $name: ${bad.head}") }
      } catch {
        case e: Throwable => println(s"ERROR $name: ${e.getMessage.take(100)}")
      }
    }
    println(s"$hits queries with unpartitioned WindowExec")
    spark.stop()
  }
}

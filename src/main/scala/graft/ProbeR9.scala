package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 optimization probe (throwaway, not driver contract):
  * A/B-times registry queries under alternative runtime SQL confs in
  * ONE JVM (alternating order, 2 timed passes each, min reported), to
  * attribute seconds before changing real queries or session config.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProbeR9 q1 q2 ..."
  */
object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE_BYTES", "64k"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Ad-hoc runtime-conf A/B slot for the next experiment.
    val tuned = Map[String, String]()
    def setConf(on: Boolean): Unit =
      tuned.foreach { case (k, v) =>
        if (on) spark.conf.set(k, v) else spark.conf.unset(k)
      }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("rel_percentiles", "ev_sessionize")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      s
    }

    val res = scala.collection.mutable.Map[(String, String), List[Double]]()
    // warmup pass (defaults)
    names.foreach(time)
    for (pass <- 1 to 2; name <- names; mode <- Seq("base", "tuned")) {
      setConf(mode == "tuned")
      val s = time(name)
      res((name, mode)) = s :: res.getOrElse((name, mode), Nil)
      setConf(false)
    }
    println(f"[probe] ${"query"}%-32s base   tuned")
    for (name <- names) {
      val b = res((name, "base")).min
      val t = res((name, "tuned")).min
      println(f"[probe] $name%-32s $b%6.3f $t%6.3f  ${t / b * 100}%5.1f%%")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the driver contract): times
  * the named queries (args, default dedup_cc) twice each through the
  * noop sink at SPARK_GRAFT_SF_DIR — pass 1 absorbs codegen/JIT
  * warmup, pass 2 is the steady state.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_cc")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (pass <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[scratch] pass $pass $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

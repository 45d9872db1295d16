package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (pass <- 1 to 2) {
      println(s"[scratch] === pass $pass ===")
      val banded = time("banded") {
        val sig = ext.Dedup.minhashSignatures(ext.Dedup.corpus(spark, sfDir))
        sig.select($"doc_id",
          posexplode(array(
            concat($"h1".cast("string"), lit("_"), $"h2".cast("string")),
            concat($"h3".cast("string"), lit("_"), $"h4".cast("string")))))
          .toDF("doc_id", "band_idx", "band_hash")
      }
      val roots = banded.groupBy($"band_idx", $"band_hash")
        .agg(min($"doc_id").as("root"), count(lit(1)).as("n"))
        .filter($"n" > 1)
      val star = banded.join(roots, Seq("band_idx", "band_hash"))
        .filter($"doc_id" =!= $"root")
        .select($"root".as("src"), $"doc_id".as("dst"))
        .distinct()
      val edges = star
        .unionByName(star.select($"dst".as("src"), $"src".as("dst")))
        .persist()
      val nEdges = time("edges materialize")(edges.count())
      println(s"[scratch] edges: $nEdges")
      var labels = time("init labels")(
        edges.select($"src".as("v")).distinct()
          .select($"v", $"v".as("cluster_id"))
          .localCheckpoint(true))
      var lastSum = -1L
      var iter = 0
      var converged = false
      while (!converged && iter < 25) {
        val next = time(s"iter $iter propagate+jump+checkpoint") {
          val prop = edges.join(labels.withColumnRenamed("v", "src"), "src")
            .select($"dst".as("v"), $"cluster_id")
          val jump = labels.as("x").join(labels.as("y"),
              col("x.cluster_id") === col("y.v"))
            .select(col("x.v").as("v"), col("y.cluster_id").as("cluster_id"))
          labels.unionByName(prop).unionByName(jump)
            .groupBy($"v").agg(min($"cluster_id").as("cluster_id"))
            .localCheckpoint(true)
        }
        val sumNow = time(s"iter $iter sum")(
          next.agg(sum($"cluster_id")).as[Long].head())
        converged = sumNow == lastSum
        lastSum = sumNow
        labels = next
        iter += 1
      }
      println(s"[scratch] iterations: $iter")
      edges.unpersist()
    }
    spark.stop()
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** A PERSISTED IVF index as a storage layout, completing the ANN
  * story beyond the in-session queries (`sim_ann_ivf` recomputes its
  * cells per run): the corpus is written once, partitioned by coarse
  * cell, and every probe afterwards reads ONLY the probed cells'
  * directories — ANN candidate generation expressed as partition
  * pruning, the same mechanism `core.Bucketing` pins for relational
  * layouts. At 10⁹ vectors the build is one broadcast-assign pass +
  * one partitioned write; a query touches nprobe/k of the data.
  *
  * Determinism: centroids are the 16 lowest-id vectors (the same
  * deterministic quantizer as sim_ivf_assign, which DuckDB-verifies
  * the assignment of); ranking ties break on vector id everywhere.
  */
object SimilarityIndex {

  /** Nearest-n cells for each (qid, qemb) against a broadcast
    * centroid frame (cid, cemb). */
  private def nearestCells(vecs: DataFrame, cents: DataFrame,
                           n: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("cos", Similarity.cosine(col("qemb"), col("cemb")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= n)
      .select(col("qid"), col("qemb"), col("cid"))
  }

  /** Build the index under `indexDir`: `centroids/` (16 rows) and
    * `vectors/` partitioned by cell — one directory per coarse cell,
    * so probing is directory pruning. */
  def buildIvf(s: SparkSession, sfDir: String, indexDir: String): Unit = {
    import s.implicits._
    val emb = Tables.embeddings(s, sfDir).select($"vec_id", $"embedding")
    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cemb"))
    cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
    nearestCells(emb.select($"vec_id".as("qid"), $"embedding".as("qemb")),
        cents, 1)
      .select($"qid".as("vec_id"), $"qemb".as("embedding"),
        $"cid".as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/vectors")
  }

  /** Probe the persisted index: per query the `nprobe` nearest cells,
    * read as a LITERAL partition filter (the probed cell set is
    * nprobe×|queries| values — driver-tiny by construction), so the
    * parquet scan lists and opens only the probed directories. Returns
    * (qid, rank, neighbor_id) top-k by cosine within probed cells.
    */
  def queryIvf(s: SparkSession, indexDir: String, queries: DataFrame,
               nprobe: Int = 2, topk: Int = 5): DataFrame = {
    import s.implicits._
    val cents = s.read.parquet(s"$indexDir/centroids")
    val probes = nearestCells(queries, cents, nprobe)
    val cells = probes.select($"cid").distinct().as[Long].collect().sorted
    val vecs = s.read.parquet(s"$indexDir/vectors")
      .filter($"cell".isin(cells: _*))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    vecs
      .join(broadcast(probes.withColumnRenamed("cid", "cell")), "cell")
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos", Similarity.cosine($"qemb", $"embedding"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= topk)
      .select($"qid", $"rank", $"vec_id".as("neighbor_id"))
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed exact ranking: global total-order bucket assignment
  * WITHOUT the single-partition WindowExec that `ntile(n) over
  * (order by ...)` plans — the formulation that single-threads every
  * row through one task at 10⁹+ rows.
  *
  * Shape: one range-partitioned sort (Spark samples range bounds, so
  * the sort itself distributes), one tiny per-partition row-count
  * collect (numPartitions longs to the driver), then a second pass
  * assigns each row its global rank from the partition's offset and
  * folds the rank into the SQL NTILE bucket formula. Because the sort
  * columns form a total order, rank — and therefore the bucket — is
  * independent of where the sampled range bounds fall, so results are
  * partition-count invariant (Round7InvarianceSpec pins this).
  *
  * Matches SQL NTILE exactly: with total = qn + r, the first r
  * buckets take q+1 rows, the rest q — remainder to the FRONT, the
  * tie-independent property both Spark and DuckDB implement.
  *
  * The sorted RDD is persisted (MEMORY_AND_DISK) because the count
  * pass and the rank pass both traverse it — without the persist the
  * range sort would run twice.
  */
object Ranking {

  def exactNtile(df: DataFrame, n: Int, sortCols: Seq[Column],
                 out: String = "tile"): DataFrame = {
    require(n > 0, "ntile bucket count must be positive")
    val ranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val q = total / n
    val r = total % n
    val bcOffsets = rdd.sparkContext.broadcast(offsets)
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = bcOffsets.value(i)
      it.map { row =>
        rank += 1
        // SQL NTILE: first r buckets of size q+1, remainder to the front.
        val tile =
          if (rank <= r * (q + 1)) (rank - 1) / (q + 1) + 1
          else r + (rank - 1 - r * (q + 1)) / q + 1
        Row.fromSeq(row.toSeq :+ tile)
      }
    }
    df.sparkSession.createDataFrame(rows,
      StructType(ranged.schema.fields :+
        StructField(out, LongType, nullable = false)))
  }
}

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
  * range sort would run twice. Lifecycle: the returned DataFrame
  * keeps the persisted RDD reachable, so blocks are NOT dropped here
  * (unpersisting before the caller materializes would re-run the
  * sort). Long-lived drivers must release them between queries —
  * Bench and Verify both call
  * `sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))`
  * in their per-query cleanup; ad-hoc sessions fall back to
  * GC + ContextCleaner.
  */
object Ranking {

  /** Distributed exact running sums over a global total order —
    * the same two-pass range-partitioned shape as [[exactNtile]],
    * replacing the `SUM(x) OVER (ORDER BY ...)` single-partition
    * WindowExec that cannot scale past one task's row budget: range
    * sort, per-partition partial sums (numPartitions × |sums| longs
    * to the driver), broadcast prefix offsets, second pass emits
    * each row's inclusive cumulative. Exact (integer addition is
    * associative) and partition-count invariant (total order ⇒ every
    * prefix is the same set regardless of range bounds).
    *
    * `sums` maps source column (non-null LongType) → output name.
    */
  def runningSums(df: DataFrame, sortCols: Seq[Column],
                  sums: Seq[(String, String)]): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val idx = sums.map { case (src, _) => ranged.schema.fieldIndex(src) }
    val nSums = idx.size
    val partials = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = new Array[Long](nSums)
      it.foreach { r =>
        var j = 0; while (j < nSums) { acc(j) += r.getLong(idx(j)); j += 1 }
      }
      Iterator((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(new Array[Long](nSums)) { (a, b) =>
      Array.tabulate(nSums)(j => a(j) + b(j))
    }
    val bcOffsets = rdd.sparkContext.broadcast(offsets)
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = bcOffsets.value(i).clone()
      it.map { row =>
        var j = 0
        while (j < nSums) { acc(j) += row.getLong(idx(j)); j += 1 }
        Row.fromSeq(row.toSeq ++ acc.toList) // toList: copy, acc mutates
      }
    }
    df.sparkSession.createDataFrame(rows,
      StructType(ranged.schema.fields ++ sums.map { case (_, out) =>
        StructField(out, LongType, nullable = false) }))
  }

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

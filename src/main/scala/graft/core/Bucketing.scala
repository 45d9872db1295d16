package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffled, co-located storage so that
  * repeated equi-joins and aggregations on the bucket key run with
  * NO exchange at query time (SURVEY.md §7.4-7; the builder-prompt
  * "bucketing for co-located joins" path).
  *
  * At 100 TB the pattern is: land fact tables bucketed by their join
  * key once at ingest; every downstream join against a table bucketed
  * the same way (same key, same bucket count) is exchange-free — the
  * shuffle is paid once at write time instead of per query.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * sort-merge joins also skip the sort). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With aligned
    * bucketing this plans as a zero-exchange sort-merge join. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Range-clustered parquet output: rows range-partitioned on
    * `clusterCol` (contiguous, disjoint value ranges per file) and
    * sorted within each partition. This is the layout that makes
    * downstream scan pruning real at 100 TB: a reader filtering on
    * the cluster column skips whole files/row-groups via parquet
    * min/max stats instead of scanning everything — the write-once
    * complement to bucketing (bucketing serves equi-joins, range
    * clustering serves range predicates). `repartitionByRange`
    * samples the column to build balanced range bounds, so skewed
    * value distributions still produce even file sizes.
    */
  def writeRangeClustered(df: DataFrame, path: String, clusterCol: String,
                          partitions: Int = 8): Unit =
    df.repartitionByRange(partitions, df(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** Hive-style partitioned parquet layout (`col=value/` directories):
    * the third storage-layout tool beside bucketing (equi-joins) and
    * range clustering (range scans) — DIRECTORY pruning for low-
    * cardinality categorical columns. A reader filtering on the
    * partition column never lists, opens or scans non-matching
    * directories (`PartitionFilters` in the scan, zero I/O for
    * pruned values — file-stats pruning still reads footers). Only
    * for low-cardinality columns: a high-cardinality partition key
    * degenerates into millions of small files and kills the listing
    * phase at 100 TB.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(path)

  /** Morton (Z-order) key: the low `bits` bits of two non-negative
    * integral columns, interleaved (a's bit i lands at 2i+1, b's at
    * 2i). Points close in BOTH dimensions are close on the Z-curve,
    * so range-partitioning by the key gives files whose parquet
    * min/max stats are tight in EACH dimension — the property a
    * single-column sort only provides for its leading column. Plain
    * shift/and/or Column arithmetic: fully codegen'd, no UDF.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             bits: Int = 21): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(bits >= 1 && bits <= 31, "1 <= bits <= 31 (2*bits must fit a long)")
    val an = a.cast("long")
    val bn = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(an, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bn, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order clustered parquet: rows range-partitioned and sorted on
    * the Morton interleave of TWO cluster columns. The fourth storage
    * layout beside bucketing / range clustering / Hive partitioning:
    * range clustering prunes one dimension perfectly and the others
    * not at all; Z-ordering trades a little of that for useful
    * min/max pruning on BOTH filter columns — the multi-dimensional
    * scan-pruning layout (Delta/Iceberg OPTIMIZE ZORDER is this
    * exact trick). Columns must be non-negative integrals; rescale /
    * epoch-day timestamps first.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    partitions: Int = 8, bits: Int = 21): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

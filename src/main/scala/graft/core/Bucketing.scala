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
}

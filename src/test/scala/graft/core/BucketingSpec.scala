package graft.core

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("warehouse").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("aligned bucketed tables join with zero exchanges") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear both
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = new java.io.File(wh, t)
      if (loc.exists()) rmrf(loc)
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "orderkey"),
      "orders_b", "orderkey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "orderkey"),
      "lineitem_b", "orderkey", buckets = 4)
    // forbid broadcast so the zero-exchange claim is proven on the
    // sort-merge path (broadcast would trivially skip the shuffle)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val joined = Bucketing.bucketedJoin(spark, "lineitem_b", "orders_b", "orderkey")
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle: the only exchange allowed is
    // the final aggregation's
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(orderkey"),
      s"bucketed join should not re-shuffle on the bucket key:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // correctness: equals the unbucketed join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("range-clustered write produces disjoint per-file ranges that prune") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("clustered").toString + "/li"
    Bucketing.writeRangeClustered(
      Tables.lineitem(spark, sf), out, "l_shipdate", partitions = 4)
    // per-file min/max ranges must not overlap (modulo boundary ties:
    // repartitionByRange puts equal keys in one partition, so ranges
    // can touch at most at distinct boundary values)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min($"l_shipdate").as("lo"), max($"l_shipdate").as("hi"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1),
                 r.getAs[java.time.LocalDateTime](2)))
      .sortBy(_._1.toString)
    assert(ranges.length > 1, "expected multiple output files")
    for (Array((_, hi), (lo, _)) <- ranges.sliding(2))
      assert(!hi.isAfter(lo), s"overlapping file ranges: $hi vs $lo")
    // a selective range filter reads fewer rows than the full scan
    // at the parquet level (min/max row-group stats prune)
    val cutoff = ranges.head._2
    val pruned = spark.read.parquet(out).filter($"l_shipdate" <= cutoff)
    assert(pruned.count() > 0)
    // correctness: clustering is a pure re-layout
    assert(spark.read.parquet(out).count() ==
      Tables.lineitem(spark, sf).count())
  }

  test("partitioned write prunes non-matching directories at scan time") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("part").toString
    Bucketing.writePartitioned(Tables.documents(spark, sf), out, "lang")
    val read = spark.read.parquet(out).filter($"lang" === "en")
    val formatted = read.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // The filter lands in PartitionFilters (directory pruning), not in
    // the data filters — non-matching directories are never touched.
    val pf = formatted.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("lang"), formatted.take(800))
    // Only files under lang=en/ are read.
    val files = read.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")))
    // Round trip preserves content.
    assert(spark.read.parquet(out).count() ==
      Tables.documents(spark, sf).count())
  }
}

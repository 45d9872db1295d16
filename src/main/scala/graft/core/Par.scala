package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scan fan-out for source-starved parallelism (optimization guide
  * §2.5, input skew: "one huge unsplittable file … repartition
  * immediately after the read"). The driver testdata ships ONE parquet
  * row group per table, so every scan is a single input split and all
  * map-side work that fuses over it — decimal aggregation buffers,
  * percentile/HLL partials, stack/shingle explodes — runs on one core
  * no matter the master parallelism.
  *
  * [[fan]] hash-repartitions to the session default parallelism ONLY
  * when the frame's planned partition count covers less than half the
  * cores. At any realistic multi-file scale (a 100 TB table is
  * O(10⁵) splits) the scan already exceeds core count and fan is a
  * provable no-op, so production plans never pay the exchange; the
  * check itself is plan-time metadata (no job).
  *
  * Rules for call sites:
  *   - only on scan-rooted narrow frames (no exchange upstream) — the
  *     partition probe plans the frame, and a shuffled upstream would
  *     make that probe itself expensive;
  *   - project to the needed columns FIRST (the exchange carries every
  *     column of the frame — guide §2.3);
  *   - keys must be deterministic, well-spread columns already in the
  *     frame: hash partitioning is retry-safe, while keyless
  *     round-robin pays a per-task sort (SPARK-23207) and replays
  *     non-deterministically.
  */
object Par {
  def fan(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target, keys: _*)
  }
}

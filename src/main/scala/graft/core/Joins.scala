package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed data (SURVEY.md §7.4-7). Spark's AQE
  * skew-join handles most cases at runtime
  * (spark.sql.adaptive.skewJoin.enabled, on by default); explicit
  * salting remains the tool when one build-side key is so hot that
  * even split partitions overwhelm a task, or when AQE is off
  * (streaming micro-batches).
  */
object Joins {

  /** Skew-safe inner equi-join on `key`: each left row gets a
    * deterministic salt in [0, factor); the right side is replicated
    * once per salt value, so a hot key's rows spread across `factor`
    * reducers instead of one. Result equals the unsalted join.
    *
    * Use when the LEFT side is large with skewed keys and the RIGHT
    * side is small enough to replicate `factor`× (dims, lookup
    * tables) but too big to broadcast outright.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    require(factor > 0)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(factor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** As-of join: for each left row, attach the latest right row with
    * `right.tsCol <= left.tsCol` for the same key (left outer — no
    * match → nulls).
    *
    * Implementation is the scalable sort-merge form: union both
    * sides tagged, one window pass per key ordered by (ts, side,
    * seq) with a running `last(_, ignoreNulls)` carrying the most
    * recent right values forward. ONE shuffle on the key, linear
    * scan per partition — no range-condition join (which Spark plans
    * as a broadcast-nested-loop or an exploding theta join), so it
    * survives both sides being large. Right rows sort before left
    * rows at equal timestamps (inclusive as-of); duplicate right
    * timestamps resolve to the last by input order, made
    * deterministic with a per-side sequence.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, rightVals: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rseq", lit(Long.MaxValue))
    val r0 = right.select(
      (col(key) +: col(tsCol) +: rightVals.map(col)): _*)
    val r = r0
      .withColumn("__rseq", monotonically_increasing_id())
      .withColumn("__side", lit(0))
    // align schemas: left lacks right value cols, right lacks left cols
    val lAligned = rightVals.foldLeft(l)((df, c) =>
      df.withColumn(s"__rv_$c", lit(null).cast(r0.schema(c).dataType)))
    val rAligned = leftCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(rightVals.foldLeft(r)((df, c) => df.withColumnRenamed(c, s"__rv_$c")))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.unionByName(rAligned)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"), col("__rseq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried = rightVals.foldLeft(unioned)((df, c) =>
      df.withColumn(s"$prefix$c",
        last(col(s"__rv_$c"), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightVals.map(c => col(s"$prefix$c"))): _*)
  }
}

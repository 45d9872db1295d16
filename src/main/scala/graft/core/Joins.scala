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
    *
    * AQE's runtime skew split (AqeSpec) covers many of these cases
    * with no code change — but it refuses any split that would force
    * an extra downstream shuffle, e.g. when a groupBy on the join key
    * wants to reuse the join's partitioning. Salting keeps working
    * there (the salted key changes the partitioning explicitly and
    * the re-aggregation cost is visible in the query).
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

  /** Point-in-interval range join via bin bucketing: each interval is
    * exploded onto the fixed-width bins it overlaps, each point maps
    * to its single bin, and the theta condition becomes an equi-join
    * on the bin plus a residual filter. Spark plans a bare
    * `p.v >= i.lo AND p.v < i.hi` join as a broadcast-nested-loop (or
    * a cartesian when neither side fits in memory); the binned form
    * is a plain hash join whose cost scales with true match count —
    * the formulation that survives both sides being large. Pick
    * `binWidth` near the typical interval width: wider bins mean more
    * residual-filtered pairs, narrower bins more interval replicas.
    */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
                       floor(col(hiCol) / binWidth).cast("long"))))
    points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join (inclusive bounds, integral
    * columns): both sides explode onto fixed-width bins and hash-join
    * on the bin. Unlike the point-in-interval case, a pair of
    * overlapping intervals co-occupies EVERY bin their overlap spans,
    * so a naive bin join emits duplicate pairs; instead of a distinct
    * pass (a second shuffle over the join output), each pair is
    * claimed only in its CANONICAL bin — the bin of
    * `greatest(aLo, bLo)`, the overlap's left edge, which both
    * intervals provably cover — so every true pair joins exactly
    * once and no dedup runs. Column names must be disjoint across
    * the two inputs. Same sizing rule as [[rangeJoinBinned]]: bin
    * width near the typical interval length.
    */
  def overlapJoinBinned(a: DataFrame, aLo: String, aHi: String,
                        b: DataFrame, bLo: String, bHi: String,
                        binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val binnedA = a.withColumn("__bin_a",
      explode(sequence(expr(s"$aLo div ${binWidth}L"),
                       expr(s"$aHi div ${binWidth}L"))))
    val binnedB = b.withColumn("__bin_b",
      explode(sequence(expr(s"$bLo div ${binWidth}L"),
                       expr(s"$bHi div ${binWidth}L"))))
    binnedA.join(binnedB,
        col("__bin_a") === col("__bin_b") &&
        col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin_a") === expr(s"greatest($aLo, $bLo) div ${binWidth}L"))
      .drop("__bin_a", "__bin_b")
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
    *
    * Row atomicity: all right value columns travel as ONE struct and
    * one `last(_, ignoreNulls)` carries that struct, so the output
    * never mixes columns from different right rows (per-column
    * carries would skip a null field back to an older row). Right
    * rows with a null timestamp are dropped up front — they carry no
    * as-of ordering and would otherwise sort first and leak into
    * every left row of their key.
    *
    * `maxStaleness` (SQL interval, e.g. `"INTERVAL 10 MINUTES"`)
    * bounds how old the carried right row may be — the feature-store
    * contract (pandas merge_asof `tolerance`): a match older than
    * the bound degrades to no-match (all carried columns null). The
    * right timestamp rides inside the carried struct, so staleness
    * is one codegen'd comparison after the same single shuffle.
    *
    * `direction` = "backward" (default: latest right ≤ left ts) or
    * "forward" (earliest right ≥ left ts — "next event after", the
    * other merge_asof mode): the forward scan is the same window
    * carry over the REVERSED timestamp order; with `maxStaleness` it
    * bounds how far ahead the match may be.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, rightVals: Seq[String],
               prefix: String = "asof_",
               maxStaleness: Option[String] = None,
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    val r0 = right
      .select((col(key) +: col(tsCol) +: rightVals.map(col)): _*)
      .filter(col(tsCol).isNotNull)
    val rvType = StructType(rightVals.map(c =>
      StructField(c, r0.schema(c).dataType, nullable = true))
      :+ StructField("__rts", r0.schema(tsCol).dataType, nullable = true))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rseq", lit(Long.MaxValue))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = leftCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(
        r0.withColumn("__rseq", monotonically_increasing_id())
          .withColumn("__side", lit(0))
          .withColumn("__rv",
            struct(rightVals.map(col) :+ col(tsCol).as("__rts"): _*))
          .select(col(key), col(tsCol), col("__side"), col("__rseq"), col("__rv")))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.unionByName(r)
    val tsOrd =
      if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(tsOrd, col("__side"), col("__rseq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__rvc",
      last(col("__rv"), ignoreNulls = true).over(w))
    val fresh = maxStaleness match {
      case None => lit(true)
      case Some(iv) if direction == "backward" =>
        col("__rvc").getField("__rts") >= col(tsCol) - expr(iv)
      case Some(iv) =>
        col("__rvc").getField("__rts") <= col(tsCol) + expr(iv)
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightVals.map(c =>
          when(fresh, col("__rvc").getField(c)).as(s"$prefix$c"))): _*)
  }
}

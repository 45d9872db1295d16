package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level Pareto frontier (minimize `price`, maximize `size`) —
  * the scalable skyline: because dominance is transitive, a point
  * dominated within ANY subset is dominated globally, so each
  * partition first drops its locally-dominated points (a sorted
  * one-pass mapPartitions) and only the per-partition frontiers meet
  * the global window. On a near-unique price domain the global pass
  * would otherwise single-thread the whole table through one
  * WindowExec partition; after the pre-filter it sees at most
  * |partitions| × |local frontier| rows.
  *
  * Semantics (shared with the rel_pareto_frontier oracle): a (price,
  * size) point survives iff no point is cheaper-or-equal AND
  * larger-or-equal with one strict; equal points merge, carrying
  * `n_parts`.
  */
object Skyline {

  /** df: (price: Double, size: Int, n_parts: Long) — one row per
    * distinct (price, size). Output: the frontier, same columns. */
  def paretoFrontier(points: DataFrame): DataFrame = {
    val s = points.sparkSession
    import s.implicits._
    // Level 1: per-partition strict-dominance filter. Sorted by
    // (price asc, size desc), a row survives iff its size beats
    // every strictly-cheaper row's max AND it is the size-max of its
    // own price run (equal-size ties collapsed upstream).
    val local = points.as[(Double, Int, Long)]
      .sortWithinPartitions($"price", $"size".desc)
      .mapPartitions { it =>
        var bestCheaper = Int.MinValue   // max size at strictly lower price
        var curPrice = Double.NaN
        var curMax = Int.MinValue        // max size within the current price
        it.flatMap { case row @ (p, sz, _) =>
          if (curPrice != p) {
            bestCheaper = math.max(bestCheaper, curMax)
            curPrice = p
            curMax = Int.MinValue
          }
          val keep = sz > bestCheaper && sz > curMax
          curMax = math.max(curMax, sz)
          if (keep) Iterator.single(row) else Iterator.empty
        }
      }
      .toDF("price", "size", "n_parts")
    // Level 2: the exact global pass over the shrunken set (identical
    // to the direct formulation).
    val wp = Window.partitionBy($"price").orderBy($"size".desc)
    // level-1 already shrank the frame to the per-partition frontier;
    // the global pass is deliberately single-partition (WindowAuditSpec).
    val w = Window.orderBy($"price")
      .rowsBetween(Window.unboundedPreceding, -1)
    local
      .withColumn("rk", row_number().over(wp))
      .filter($"rk" === 1).drop("rk")
      .withColumn("m", max($"size").over(w))
      .filter($"m".isNull || $"size" > $"m")
      .select($"price", $"size", $"n_parts")
  }
}

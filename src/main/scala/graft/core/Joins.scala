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
}

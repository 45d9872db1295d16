package graft.parity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive column-split detection — the reference's
  * analyze_column_structure (/root/reference/lambda_function.py:96-131;
  * dead code there, the live path uses the constant 0.5). Revived here
  * as a first-class distributed operator per SURVEY.md §2.4: per
  * document, a 20-bin histogram of line left-positions; the split
  * threshold is the center of the emptiest bin among bins 5–14
  * (ties → lowest bin, matching Python's strict-< scan), with the
  * reference's fallbacks (<10 lines or x-range <0.1 → 0.5).
  *
  * Shape at scale: two hash aggregations on `doc` (stats + bin
  * counts) and a broadcast-sized bins-per-doc frame — no sorts, no
  * per-doc collect.
  */
object ColumnStructure {

  /** lines: (doc, left) — already scan-filtered (LINE, non-empty,
    * non-header), as produced by FarmPipeline.linesFromBlocks.
    * Returns (doc, threshold). */
  def columnThresholds(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._

    val stats = lines.groupBy($"doc").agg(
      count(lit(1)).as("n_lines"),
      min($"left").as("min_pos"),
      max($"left").as("max_pos"))

    val eligible = stats
      .withColumn("range_width", $"max_pos" - $"min_pos")
      .withColumn("bin_size", $"range_width" / 20.0)

    // int((pos - min) / bin_size) capped at 19 (:120)
    val binned = lines.join(eligible, "doc")
      .filter($"n_lines" >= 10 && $"range_width" >= 0.1)
      .withColumn("bin", least(lit(19),
        floor(($"left" - $"min_pos") / $"bin_size").cast("int")))
      .groupBy($"doc", $"bin").agg(count(lit(1)).as("cnt"))

    // all candidate bins 5..14, zero-filled (an empty bin must win)
    val candidates = eligible
      .filter($"n_lines" >= 10 && $"range_width" >= 0.1)
      .select($"doc", $"min_pos", $"bin_size",
        explode(sequence(lit(5), lit(14))).as("bin"))
      .join(binned, Seq("doc", "bin"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))

    val gapBins = candidates
      .groupBy($"doc", $"min_pos", $"bin_size")
      .agg(min_by($"bin", struct($"cnt", $"bin")).as("gap_bin"))
      .select($"doc",
        ($"min_pos" + ($"gap_bin" + 0.5) * $"bin_size").as("threshold"))

    stats.select($"doc").join(gapBins, Seq("doc"), "left")
      .withColumn("threshold", coalesce($"threshold", lit(0.5)))
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Round-5 layout-and-planning wave: the table-maintenance and
  * experiment-planning operators that run BESIDE the query families —
  *
  *   - `rel_compaction_plan`: small-file bin-packing (the OPTIMIZE /
  *     compaction planner every parquet lake runs: files under
  *     minFileSize are grouped per partition into targetSize
  *     compaction groups; files at or above minFileSize are left in
  *     place);
  *   - `rel_zorder_layout`: Morton (Z-order) interleave of two join /
  *     filter dimensions into one clustering key — the multi-column
  *     data-layout that turns 2-D predicates into contiguous file
  *     ranges, with the bounded-rectangle property the spec pins;
  *   - `ev_power_analysis`: the pre-experiment sample-size calculator
  *     (alpha 0.05 two-sided, power 0.8) from exact per-user moment
  *     sums — read BEFORE ev_srm_check and ev_ab_ttest ever run.
  *
  * Determinism contract (the family-wide rule): every exported number
  * is an integer produced by associative integer/decimal sums and
  * `div`; no IEEE double is exported.
  */
object LakeOps {

  /** Morton interleave of the low 10 bits of two non-negative longs,
    * written with `%` and integer division only — the arithmetic
    * subset Spark (`div`) and DuckDB (`//`) evaluate identically on
    * non-negative values, so ONE generated formula serves both the
    * Column expression and the oracle SQL. Bit i of x lands at z-bit
    * 2i, bit i of y at 2i+1. */
  private def mortonSql(x: String, y: String, divOp: String): String =
    (0 until 10).map { i =>
      val p = 1L << i
      s"(($x $divOp $p) % 2) * ${1L << (2 * i)}" +
        s" + (($y $divOp $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Compaction planning (Delta/Iceberg OPTIMIZE shape): the file
    // inventory is modeled as one "file" per (ship-month partition,
    // 512-wide orderkey range) — n_rows rows at 4096 bytes/row.
    // Files under minFileSize = 16 KiB are packed, in file_seq order
    // within their partition, into targetSize = 64 KiB compaction
    // groups via the exclusive-running-sum device (txt_pack_batches /
    // mm_modality_pack); files at or above minFileSize keep a
    // singleton group (-(file_seq+1) — disjoint from packed ids by
    // sign). The shuffle carries ONE ROW PER FILE, never file
    // contents — the property that makes the planner itself a
    // metadata-scale job at 100 TB (the rewrite it plans is the
    // expensive part, and each group is an independent task). The
    // window partitions by month, so no global ordering exists.
    Q("rel_compaction_plan",
      (s, d) => {
        import s.implicits._
        val files = Tables.lineitem(s, d)
          .groupBy(date_trunc("month", $"l_shipdate").as("part_month"),
            expr("l_orderkey div 512").as("file_seq"))
          .agg(count(lit(1)).as("n_rows"))
          .withColumn("bytes", $"n_rows" * 4096L)
        val w = Window.partitionBy($"part_month").orderBy($"file_seq")
        val small = files.filter($"bytes" < 16384L)
          .withColumn("cx", sum($"bytes").over(w) - $"bytes")
          .select($"part_month", $"file_seq", $"n_rows", $"bytes",
            lit(1L).as("is_small"), expr("cx div 65536").as("group_id"))
        val large = files.filter($"bytes" >= 16384L)
          .select($"part_month", $"file_seq", $"n_rows", $"bytes",
            lit(0L).as("is_small"), (-$"file_seq" - 1L).as("group_id"))
        small.unionByName(large)
      },
      Some("""WITH files AS (
          SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
              AS part_month,
            l_orderkey // 512 AS file_seq,
            COUNT(*) AS n_rows, COUNT(*) * 4096 AS bytes
          FROM lineitem GROUP BY 1, 2),
        small AS (
          SELECT part_month, file_seq, n_rows, bytes,
            CAST(1 AS BIGINT) AS is_small,
            CAST((SUM(bytes) OVER (PARTITION BY part_month
                ORDER BY file_seq) - bytes) // 65536 AS BIGINT)
              AS group_id
          FROM files WHERE bytes < 16384),
        large AS (
          SELECT part_month, file_seq, n_rows, bytes,
            CAST(0 AS BIGINT) AS is_small,
            -file_seq - 1 AS group_id
          FROM files WHERE bytes >= 16384)
        SELECT * FROM small UNION ALL SELECT * FROM large""")),

    // ------------------------------------------------------------------
    // Z-order layout audit: each row's (l_partkey % 1024,
    // l_suppkey % 1024) pair is interleaved into a 20-bit Morton key
    // and bucketed by its high 8 bits (z div 4096) — the clustering
    // key a 2-D-filtered table is rewritten under so that a predicate
    // on EITHER dimension prunes contiguous buckets. The output is
    // the per-bucket bounding rectangle: by construction a bucket
    // spans at most a 64-aligned 64×64 square (low 6 bits of each
    // dimension vary, high bits are fixed), which the spec pins —
    // that bounded-span property IS the pruning guarantee. One scan,
    // one aggregation, everything integer; the Morton formula is
    // generated once and evaluated identically by both engines.
    Q("rel_zorder_layout",
      (s, d) => {
        import s.implicits._
        val z = mortonSql("x", "y", "div")
        Tables.lineitem(s, d)
          .select(($"l_partkey" % 1024L).as("x"),
            ($"l_suppkey" % 1024L).as("y"))
          .withColumn("zbucket", expr(s"$z div 4096"))
          .groupBy($"zbucket")
          .agg(count(lit(1)).as("n_rows"),
            min($"x").as("min_x"), max($"x").as("max_x"),
            min($"y").as("min_y"), max($"y").as("max_y"))
      },
      Some(s"""WITH pts AS (
          SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y
          FROM lineitem),
        keyed AS (
          SELECT x, y, ${mortonSql("x", "y", "//")} // 4096 AS zbucket
          FROM pts)
        SELECT zbucket, COUNT(*) AS n_rows,
          MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y
        FROM keyed GROUP BY zbucket""")),

    // ------------------------------------------------------------------
    // Pre-experiment power analysis: per event type, the per-arm
    // sample size needed to detect a 5% lift on the per-user value
    // total at alpha 0.05 (two-sided) / power 0.8 —
    // n = 2 (z_.975 + z_.8)^2 sigma^2 / delta^2, with the constant
    // 2 * (1.959964 + 0.841621)^2 = 15.697757 carried in micro-units.
    // Variance comes from EXACT per-user micro-sums and DECIMAL(38,0)
    // moments (the ev_cuped device): varn = n*ssq - s^2 is exact, and
    // n_required is one integer division of 128-bit exact products —
    // bit-identical under any partial-agg order and in DuckDB
    // (HUGEINT). A type with no measurable mean (delta_micro = 0)
    // reports -1. This is the planning read BEFORE ev_srm_check
    // validates the split and ev_ab_ttest / ev_cuped read the result.
    Q("ev_power_analysis",
      (s, d) => {
        import s.implicits._
        val dec = DecimalType(38, 0)
        val vMicro = floor($"value" * 1000000).cast("long")
        val ux = Tables.events(s, d)
          .groupBy($"event_type", $"user_id")
          .agg(sum(vMicro).as("u"))
        ux.groupBy($"event_type")
          .agg(count(lit(1)).as("n_users"),
            sum($"u".cast(dec)).as("s"),
            sum($"u".cast(dec) * $"u").as("ssq"))
          .withColumn("varn", expr("n_users * ssq - s * s"))
          .withColumn("mean_micro", expr("s div n_users"))
          .withColumn("delta_micro", expr("mean_micro div 20"))
          .withColumn("n_required", coalesce(expr(
            "(15697757 * varn) div nullif(cast(1000000 as decimal(38,0))" +
              " * (n_users * (n_users - 1)) * delta_micro * delta_micro," +
              " 0)"), lit(-1L)))
          .select($"event_type", $"n_users", $"mean_micro", $"delta_micro",
            $"n_required",
            when($"n_required" >= 0L &&
              $"n_required" * 2L <= $"n_users", 1L).otherwise(0L)
              .as("is_powered"))
      },
      Some("""WITH ux AS (
          SELECT event_type, user_id,
            CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
              AS u
          FROM events GROUP BY event_type, user_id),
        agg AS (
          SELECT event_type, COUNT(*) AS n_users,
            CAST(SUM(u) AS HUGEINT) AS s,
            CAST(SUM(CAST(u AS HUGEINT) * u) AS HUGEINT) AS ssq
          FROM ux GROUP BY event_type),
        norm AS (
          SELECT event_type, n_users,
            n_users * ssq - s * s AS varn,
            CAST(s // n_users AS BIGINT) AS mean_micro
          FROM agg),
        fin AS (
          SELECT event_type, n_users, mean_micro,
            mean_micro // 20 AS delta_micro,
            COALESCE(CAST((15697757 * varn) // NULLIF(
              1000000 * CAST(n_users AS HUGEINT) * (n_users - 1)
              * (mean_micro // 20) * (mean_micro // 20), 0) AS BIGINT),
              -1) AS n_required
          FROM norm)
        SELECT event_type, n_users, mean_micro, delta_micro, n_required,
          CASE WHEN n_required >= 0 AND n_required * 2 <= n_users
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
            AS is_powered
        FROM fin"""))
  )
}

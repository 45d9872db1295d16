package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** The remaining TPC-H-shaped queries expressible over the driver
  * testdata (no partsupp table exists, so literal Q2/Q11/Q16/Q20 are
  * out of reach; Q12 needs l_shipmode/commitdate and literal Q22
  * needs c_phone — both absent).
  *
  *  - rel_volume_shipping  (Q7)  — bidirectional nation-pair revenue
  *  - rel_market_share     (Q8)  — one nation's share of a region's market
  *  - rel_promo_revenue    (Q14) — promo share of revenue by month
  *  - rel_top_supplier     (Q15) — supplier(s) with max quarterly revenue
  *  - rel_lapsed_customers (Q22 adapted) — high-balance customers with no
  *    recent orders, grouped by nation instead of phone prefix
  *  - rel_min_cost_supplier (Q2 adapted) — per-part minimum-cost supplier
  *    with lineitem as the price list instead of partsupp
  *
  * Scale notes: every dimension (nation/region/supplier/customer/part
  * projections) is explicitly broadcast so the lineitem/orders fact
  * side never shuffles for a dim lookup; nation-pair and region
  * predicates are applied to the dims BEFORE the join so the fact rows
  * are pruned by the broadcast hash lookup itself; scalar thresholds
  * (max revenue, average balance) are computed by a full aggregation
  * and broadcast back as 1-row literals, never a driver collect.
  * Ratio outputs follow the repo determinism rule: numerator and
  * denominator are exact decimal sums, divided once in IEEE double —
  * bit-identical under any partial-aggregation order.
  */
object TpchFinal {

  private def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(27, scale))).cast("double")

  /** Exact decimal sum (NOT cast to double) for ratio building blocks. */
  private def xsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(27, scale)))

  private def ts(lit0: String): Column = to_timestamp(lit(s"$lit0 00:00:00"))

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Q7: revenue shipped between two nations, both directions, by year.
    // Nation filters land on the broadcast dims, so the supplier and
    // customer hash joins prune the fact rows; only the cross-pair
    // inequality remains as a post-join filter.
    Q("rel_volume_shipping",
      (s, d) => {
        import s.implicits._
        val pair = Seq("NATION_1", "NATION_2")
        val n1 = Tables.nation(s, d).filter($"n_name".isin(pair: _*))
          .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
        val n2 = Tables.nation(s, d).filter($"n_name".isin(pair: _*))
          .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
        val supp = Tables.supplier(s, d).select($"s_suppkey", $"s_nationkey")
          .join(broadcast(n1), $"s_nationkey" === $"s_nk")
        val cust = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
          .join(broadcast(n2), $"c_nationkey" === $"c_nk")
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= ts("1996-01-01") &&
                  $"l_shipdate" <  ts("1998-01-01"))
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
          .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .filter($"supp_nation" =!= $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation",
            year($"l_shipdate").as("l_year"))
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("revenue"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
          CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            EXTRACT(YEAR FROM l_shipdate) AS l_year,
            l_extendedprice * (1.0 - l_discount) AS volume
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            AND n1.n_name IN ('NATION_1', 'NATION_2')
            AND n2.n_name IN ('NATION_1', 'NATION_2')
            AND n1.n_name <> n2.n_name) shipping
        GROUP BY supp_nation, cust_nation, l_year""")),

    // ------------------------------------------------------------------
    // Q8: NATION_3's share of the ASIA market for PROMO parts by order
    // year. Both sums stay exact decimal; the share is one double
    // division at the end.
    Q("rel_market_share",
      (s, d) => {
        import s.implicits._
        val asiaCust = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
          .join(broadcast(Tables.nation(s, d)
            .select($"n_nationkey", $"n_regionkey")),
            $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"c_custkey")
        val suppNation = Tables.supplier(s, d)
          .select($"s_suppkey", $"s_nationkey")
          .join(broadcast(Tables.nation(s, d)
            .select($"n_nationkey", $"n_name".as("supp_nation"))),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"supp_nation")
        val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter($"p_type" === "PROMO")
            .select($"p_partkey")), $"l_partkey" === $"p_partkey")
          .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
          .join(Tables.orders(s, d)
            .filter($"o_orderdate" >= ts("1996-01-01") &&
                    $"o_orderdate" <  ts("1998-01-01"))
            .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
            $"l_orderkey" === $"o_orderkey")
          .join(broadcast(asiaCust), $"o_custkey" === $"c_custkey")
          .groupBy(year($"o_orderdate").as("o_year"))
          .agg(
            xsum(when($"supp_nation" === "NATION_3", vol).otherwise(lit(0.0)))
              .as("nation_vol"),
            xsum(vol).as("total_vol"))
          .select($"o_year",
            ($"nation_vol".cast("double") / $"total_vol".cast("double"))
              .as("mkt_share"),
            $"total_vol".cast("double").as("total_volume"))
      },
      Some("""SELECT o_year,
          CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                             ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
            / CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE)
            AS mkt_share,
          CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS total_volume
        FROM (
          SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
            l_extendedprice * (1.0 - l_discount) AS volume,
            sn.n_name AS supp_nation
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region ON cn.n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') mkt
        GROUP BY o_year""")),

    // ------------------------------------------------------------------
    // Q14: share of revenue from PROMO parts, by ship month of 1997.
    Q("rel_promo_revenue",
      (s, d) => {
        import s.implicits._
        val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= ts("1997-01-01") &&
                  $"l_shipdate" <  ts("1998-01-01"))
          .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_type")),
            $"l_partkey" === $"p_partkey")
          .groupBy(date_trunc("month", $"l_shipdate").as("ship_month"))
          .agg(
            xsum(when($"p_type" === "PROMO", vol).otherwise(lit(0.0)))
              .as("promo"),
            xsum(vol).as("total"))
          .select($"ship_month",
            (lit(100.0) * $"promo".cast("double") / $"total".cast("double"))
              .as("promo_pct"),
            $"total".cast("double").as("total_revenue"))
      },
      Some("""SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
            AS ship_month,
          100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
              AS DECIMAL(27,6))) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
              AS DECIMAL(27,6))) AS DOUBLE) AS promo_pct,
          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1""")),

    // ------------------------------------------------------------------
    // Q15: supplier(s) with the maximum revenue in 1997Q1. The max is a
    // 1-row aggregate broadcast back over the rollup (never collected
    // to the driver); equality on the exact decimal makes ties and the
    // match itself deterministic.
    Q("rel_top_supplier",
      (s, d) => {
        import s.implicits._
        val rev = Tables.lineitem(s, d)
          .filter($"l_shipdate" >= ts("1997-01-01") &&
                  $"l_shipdate" <  ts("1997-04-01"))
          .groupBy($"l_suppkey")
          .agg(xsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("total_rev"))
        val mx = rev.agg(max($"total_rev").as("max_rev"))
        rev.join(broadcast(mx), $"total_rev" === $"max_rev")
          .join(broadcast(Tables.supplier(s, d)
            .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name",
            $"total_rev".cast("double").as("total_revenue"))
      },
      Some("""WITH rev AS (
          SELECT l_suppkey,
            SUM(CAST(l_extendedprice * (1.0 - l_discount)
              AS DECIMAL(27,6))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""")),

    // ------------------------------------------------------------------
    // Q22 adapted to the testdata (no c_phone): customers whose balance
    // exceeds the average positive balance and who placed no order since
    // 1999, grouped by nation. Threshold = exact decimal sum / count,
    // divided once in double; the anti join is on a date-pruned orders
    // projection.
    Q("rel_lapsed_customers",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val thr = cust.filter($"c_acctbal" > lit(0.0))
          .agg(xsum($"c_acctbal", 2).as("sum_bal"), count(lit(1)).as("n_bal"))
          .select(($"sum_bal".cast("double") / $"n_bal").as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter($"o_orderdate" >= ts("1999-01-01"))
          .select($"o_custkey")
        cust.join(broadcast(thr))
          .filter($"c_acctbal" > $"avg_bal")
          .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
          .join(broadcast(Tables.nation(s, d)
            .select($"n_nationkey", $"n_name")),
            $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("numcust"),
               dsum($"c_acctbal", 2).as("totacctbal"))
      },
      Some("""WITH thr AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
            / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0.0)
        SELECT n_name, COUNT(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg_bal FROM thr)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY n_name""")),

    // ------------------------------------------------------------------
    // Q2 shape adapted: for each small part (p_size < 10), the
    // region-0 supplier(s) offering the minimum unit price, with
    // lineitem standing in for the absent partsupp price list. The
    // correlated `price = (SELECT MIN ...)` subquery is decorrelated
    // the way Catalyst would: a per-part pre-aggregation and an
    // equi-join back on (partkey, price == min) — both sides share
    // the partkey partitioning, and every dimension (supplier⋈nation
    // pre-filtered to the region BEFORE the join, part pre-filtered
    // on size) broadcasts, so the fact table never shuffles for a
    // lookup and rows outside the region/size never leave the scan.
    // unit_price is a single per-row IEEE division of two stored
    // doubles — deterministic in both engines, no sums — and MIN
    // then SELECTS one of those values, so the join-back equality
    // and the exported double are exact. Ties (two suppliers at the
    // same minimum) surface as multiple rows, as in Q2; DISTINCT
    // collapses a supplier quoting the same minimum twice.
    Q("rel_min_cost_supplier",
      (s, d) => {
        val regionNations = Tables.nation(s, d)
          .filter(col("n_regionkey") === 0)
          .select(col("n_nationkey"), col("n_name"))
        val suppliers = Tables.supplier(s, d)
          .join(broadcast(regionNations),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val smallParts = Tables.part(s, d)
          .filter(col("p_size") < 10)
          .select(col("p_partkey"), col("p_name"))
        val supply = Tables.lineitem(s, d)
          .join(broadcast(suppliers), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"),
            (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
        val minp = supply.groupBy(col("p_partkey").as("m_partkey"))
          .agg(min(col("unit_price")).as("min_price"))
        supply.join(minp,
            col("p_partkey") === col("m_partkey") &&
            col("unit_price") === col("min_price"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"), col("min_price"))
          .distinct()
      },
      Some("""WITH supply AS (
          SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
            l_extendedprice / l_quantity AS unit_price
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE n.n_regionkey = 0 AND p.p_size < 10),
        minp AS (
          SELECT p_partkey AS m_partkey, MIN(unit_price) AS min_price
          FROM supply GROUP BY p_partkey)
        SELECT DISTINCT p_partkey, p_name, s_name, n_name, min_price
        FROM supply JOIN minp
          ON p_partkey = m_partkey AND unit_price = min_price"""))
  )
}

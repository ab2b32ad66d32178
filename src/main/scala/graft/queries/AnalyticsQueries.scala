package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.AsOf

/** Temporal joins and the analytics surface SURVEY §2 marks "not present"
  * in the reference (as-of/range joins, grouping sets, distinct counts,
  * full ranking suite) — all shuffle-minimal and oracle-verified.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private def typed(s: SparkSession, d: String, tpe: String): DataFrame =
    t(s, d, "events").where(col("event_type") === tpe)

  val all: Seq[Q] = Seq(

    // ---- as-of join (SURVEY §2.3 gap; AsOf.asofJoin is the scale path:
    // one union + one window shuffle, never a per-key cross product) -----
    Q("j_asof_join",
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |       m.click_id, m.click_value
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id, c.value AS click_value
        |  FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
        |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) m ON true
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val purchases = typed(s, d, "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = typed(s, d, "click").select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
      AsOf.asofJoin(purchases, clicks, "user_id", "ts",
          payload = Seq("click_id", "click_value"), tiebreak = "click_id")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("click_id"), col("click_value"))
        .orderBy("event_id")
    },

    // ---- bounded range join (banded equi-join, constant 2x replication
    // instead of a nested-loop theta join) --------------------------------
    Q("j_range_join",
      s"""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT * FROM events WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id,
         |       CAST(count(c.event_id) AS BIGINT) AS n_follow_clicks,
         |       COALESCE(${Fp.moneySumSql("c.value")}, 0.0) AS follow_value
         |FROM p LEFT JOIN c ON c.user_id = p.user_id
         |  AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
      val purchases = typed(s, d, "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = typed(s, d, "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val joined = AsOf.bandedRangeJoin(purchases, clicks, "user_id", "ts",
        expr("INTERVAL 1 HOUR"), bucketSeconds = 3600L)
      val agg = joined.groupBy("event_id", "user_id")
        .agg(count(col("r_event_id")).as("n_follow_clicks"),
          Fp.moneySum(col("r_value")).as("follow_value"))
      purchases.select("event_id", "user_id")
        .join(agg, Seq("event_id", "user_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_follow_clicks"), lit(0L)).as("n_follow_clicks"),
          coalesce(col("follow_value"), lit(0.0)).as("follow_value"))
        .orderBy("event_id")
    },

    // ---- distinct counts (SURVEY §2.4 gap: exact; approx_count_distinct
    // covered by AnalyticsSpec — not DuckDB-comparable bit-for-bit) -------
    Q("a_distinct_count",
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        t(s, d, "events").groupBy("event_type")
          .agg(countDistinct("user_id").as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type")
    },

    // ---- grouping sets (finer than cube/rollup: exactly the wanted
    // combinations, one shuffle via Expand) -------------------------------
    Q("a_grouping_sets",
      s"""SELECT o_orderstatus, o_orderpriority,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${Fp.moneySumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus),
         |                        (o_orderstatus, o_orderpriority), ())
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")),
            Seq(col("o_orderstatus"), col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Fp.moneySum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ---- ranking suite (rank/dense_rank/percent_rank over a tied order,
    // ntile/row_number over a total order — deterministic either way) ----
    // ---- second-moment statistics (corr/covar/stddev/var): one grouped
    // pass, all algebraic (partial-aggregable), rounded for FP parity.
    // Skewness definitions differ by engine: Spark computes population g1
    // (m3/m2^1.5), DuckDB bias-corrected SAMPLE skewness G1. Convert
    // explicitly — G1 = g1 * sqrt(n(n-1))/(n-2) — instead of relying on
    // large groups to shrink the correction below the rounding epsilon. --
    Q("a_stats_suite",
      s"""SELECT l_returnflag,
         |  ${Fp.rSql("corr(l_quantity, l_extendedprice)", 4)} AS corr_qty_price,
         |  ${Fp.rSql("covar_samp(l_quantity, l_extendedprice)", 2)} AS covar_qty_price,
         |  ${Fp.rSql("stddev_samp(l_quantity)", 4)} AS sd_qty,
         |  ${Fp.rSql("var_samp(l_quantity)", 4)} AS var_qty,
         |  ${Fp.rSql("skewness(l_quantity)", 4)} AS skew_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem").groupBy("l_returnflag")
          .agg(
            Fp.r(corr(col("l_quantity"), col("l_extendedprice")), 4)
              .as("corr_qty_price"),
            Fp.r(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
              .as("covar_qty_price"),
            Fp.r(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            Fp.r(var_samp(col("l_quantity")), 4).as("var_qty"),
            skewness(col("l_quantity")).as("__g1"),
            count(col("l_quantity")).as("__n"))
          .select(col("l_returnflag"), col("corr_qty_price"),
            col("covar_qty_price"), col("sd_qty"), col("var_qty"),
            // n <= 2 → sample skewness undefined (DuckDB yields NULL).
            // The n(n-1) correction is computed in DOUBLE: long n*(n-1)
            // overflows (ANSI ArithmeticException) past ~3e9 rows/group.
            when(col("__n") > 2,
              Fp.r(col("__g1") *
                sqrt(col("__n").cast("double") *
                  (col("__n").cast("double") - 1)) /
                (col("__n").cast("double") - 2), 4)).as("skew_qty"))
          .orderBy("l_returnflag")
    },

    Q("w_rank_ntile",
      """SELECT o_orderkey, o_orderstatus,
        |       CAST(rank() OVER wt AS INT) AS rnk,
        |       CAST(dense_rank() OVER wt AS INT) AS drnk,
        |       round(percent_rank() OVER wt + 1e-7, 6) AS prnk,
        |       round(cume_dist() OVER wt + 1e-7, 6) AS cdist,
        |       CAST(ntile(4) OVER wu AS INT) AS quartile,
        |       CAST(row_number() OVER wu AS INT) AS rn,
        |       CAST(nth_value(o_orderkey, 2) OVER
        |         (PARTITION BY o_orderstatus
        |          ORDER BY o_orderpriority, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS BIGINT) AS second_key
        |FROM orders
        |WINDOW wt AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority),
        |       wu AS (PARTITION BY o_orderstatus
        |              ORDER BY o_orderpriority, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val wt = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
      val wu = Window.partitionBy("o_orderstatus")
        .orderBy("o_orderpriority", "o_orderkey")
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
          rank().over(wt).as("rnk"),
          dense_rank().over(wt).as("drnk"),
          Fp.r(percent_rank().over(wt), 6).as("prnk"),
          Fp.r(cume_dist().over(wt), 6).as("cdist"),
          ntile(4).over(wu).as("quartile"),
          row_number().over(wu).as("rn"),
          nth_value(col("o_orderkey"), 2).over(
            wu.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("second_key"))
        .orderBy("o_orderkey")
    },
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.TimeSeries

/** Ordered-analytics widening (SURVEY §2.5 note: the reference
  * approximates windows procedurally; these are the window shapes a
  * year-grain territorial warehouse needs as first-class operators):
  * moving frames, dense-series gap fill with forward fill, and
  * wide↔long reshaping (the inverse of A6's pivot).
  */
object SeriesQueries {

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.load(s, d, n)

  val all: Seq[Q] = Seq(

    // Rolling z-score anomaly detection: per event type, each day's count
    // against the trailing CALENDAR week's mean/std — a RANGE frame over
    // epoch-days, so a sparse series with gap days still gets a true
    // 7-day baseline (a ROWS frame would silently reach weeks back); the
    // frame ends at 1 PRECEDING so the tested point never contaminates
    // its own baseline. One shuffle keyed by series id, one sorted
    // window — the per-series state at 100 TB is 7 numbers, and a skewed
    // series is still one partition of daily aggregates, not raw events.
    Q("w_anomaly_zscore",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dnum,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |z AS (
        |  SELECT event_type, day, n,
        |    round((n - avg(n) OVER w) / nullif(stddev_samp(n) OVER w, 0)
        |          + 1e-7, 4) AS zscore
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY dnum
        |               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, CAST(day AS VARCHAR) AS day, n,
        |       zscore,
        |       CASE WHEN zscore > 3 OR zscore < -3 THEN 1 ELSE 0 END
        |         AS is_anomaly
        |FROM z ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dnum", unix_date(col("day")))
      val w = Window.partitionBy("event_type").orderBy("dnum")
        .rangeBetween(-7, -1)
      daily
        .withColumn("zscore",
          Fp.r((col("n") - avg("n").over(w)) /
            nullif(stddev_samp(col("n")).over(w), lit(0)), 4))
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("n"), col("zscore"),
          when(col("zscore") > 3 || col("zscore") < -3, 1).otherwise(0)
            .as("is_anomaly"))
        .orderBy("event_type", "day")
    },

    // Moving-frame window aggregates: 3-row trailing average + per-key
    // first value. One shuffle (partition by key), sort within partition.
    Q("w_moving_avg",
      """SELECT o_custkey, o_orderkey,
        |       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-7, 2) AS mavg3,
        |       round(first_value(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey), 2) AS first_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          Fp.r(avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 2)
            .as("mavg3"),
          round(first("o_totalprice").over(w), 2).as("first_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Dense-series gap fill: every (customer, year) cell in the span,
    // counts zero-filled, last seen yearly total carried forward.
    Q("w_gap_fill",
      """WITH per AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS y,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS tot
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (SELECT o_custkey, min(y) AS y0, max(y) AS y1 FROM per GROUP BY 1),
        |grid AS (SELECT o_custkey, CAST(unnest(generate_series(y0, y1)) AS INT) AS y
        |         FROM bounds),
        |j AS (SELECT g.o_custkey, g.y, p.n, p.tot FROM grid g
        |      LEFT JOIN per p ON g.o_custkey = p.o_custkey AND g.y = p.y)
        |SELECT o_custkey, y, coalesce(n, 0) AS n_orders,
        |       last_value(tot IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY y)
        |         AS last_tot
        |FROM j ORDER BY o_custkey, y""".stripMargin) { (s, d) =>
      val per = t(s, d, "orders")
        .groupBy(col("o_custkey"), year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n"), Fp.moneySum(col("o_totalprice")).as("tot"))
      TimeSeries.gapFill(per, "o_custkey", "y")
        .select(col("o_custkey"), col("y"),
          coalesce(col("n"), lit(0L)).as("n_orders"),
          TimeSeries.ffill(col("tot"), "o_custkey", "y").as("last_tot"))
        .orderBy("o_custkey", "y")
    },

    // Wide→long unpivot (inverse of A6's pivot; Spark `Dataset.unpivot`).
    Q("a_unpivot",
      """WITH a AS (
        |  SELECT l_returnflag,
        |         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
        |         CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a)
        |ORDER BY l_returnflag, measure""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(Fp.moneySum(col("l_quantity")).as("sum_qty"),
          Fp.moneySum(col("l_extendedprice")).as("sum_price"),
          Fp.moneySum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // Funnel conversion: of the users with a 'view', how many purchased
    // within 24h of their FIRST view. One per-user min + one equi join
    // with the time bound as a residual — never event×event.
    Q("a_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT DISTINCT v.user_id FROM v JOIN events p
        |         ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |         AND p.ts >= v.first_view
        |         AND p.ts <= v.first_view + INTERVAL 24 HOUR)
        |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewers,
        |       CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted,
        |       round(CASE WHEN (SELECT count(*) FROM v) > 0
        |             THEN (SELECT count(*) FROM conv) * 1.0
        |                  / (SELECT count(*) FROM v) END + 1e-7, 4)
        |         AS conversion_rate""".stripMargin) {
      (s, d) =>
        val e = t(s, d, "events")
        // materialized once (user-grain): both funnel stages read it —
        // r18 replaced two driver-serialized count() actions with one
        // lazy cross join of the two one-row aggregates (one job,
        // concurrent subtrees)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("first_view"))
          .localCheckpoint()
        val viewers = broadcast(v.agg(count(lit(1)).as("n_viewers")))
        val converted = broadcast(v.join(
            e.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts")),
            Seq("user_id"))
          .filter(col("ts") >= col("first_view") &&
            col("ts") <= col("first_view") + expr("INTERVAL 24 HOURS"))
          .select("user_id").distinct()
          .agg(count(lit(1)).as("n_converted")))
        // guarded like the marts' pct(): no viewers → NULL rate, not NaN
        viewers.crossJoin(converted)
          .select(col("n_viewers"), col("n_converted"),
            Fp.r(when(col("n_viewers") > 0,
              col("n_converted").cast("double") / col("n_viewers")), 4)
              .as("conversion_rate"))
    },

    // Event-transition matrix (Markov counts): what follows what, per
    // user session stream — ONE lead window keyed by user (ts, event_id
    // tiebreak for simultaneous events), then a count per (from, to)
    // pair. The window shuffles by user_id; the matrix is |types|².
    Q("a_transitions",
      """WITH s AS (SELECT user_id, event_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS next_type
        |           FROM events)
        |SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        |FROM s WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "next_type")
    },

    // Cohort retention: users grouped by first-activity day, counted per
    // day offset — the standard retention triangle. Two aggregations and
    // one user-keyed join; nothing scales beyond (users × active days).
    Q("a_retention",
      """WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |           FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT f.cohort_day,
        |       CAST(datediff('day', f.cohort_day, a.day) AS INT) AS day_offset,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM act a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val e = t(s, d, "events")
      val f = e.groupBy("user_id").agg(to_date(min(col("ts"))).as("cohort_day"))
      val act = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      act.join(f, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_day", "day_offset")
    },
  )
}

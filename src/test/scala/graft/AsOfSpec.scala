package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.etl.AsOf

/** Temporal joins: as-of (latest right row at-or-before each left row) and
  * banded range join (bounded-interval matches via equi-band join). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: clicks at 10:00 (id 100, v 1.0), 10:30 (id 101, v 2.0),
  //         10:30 (id 102, v 3.0 — tie on ts, higher id wins)
  // user 2: no clicks at all
  private def clicks = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    (101L, 1L, ts("2024-01-01 10:30:00"), 2.0),
    (102L, 1L, ts("2024-01-01 10:30:00"), 3.0))
    .toDF("click_id", "user_id", "ts", "click_value")

  private def purchases = Seq(
    (200L, 1L, ts("2024-01-01 09:59:00")), // before any click → null
    (201L, 1L, ts("2024-01-01 10:00:00")), // exactly at → inclusive match
    (202L, 1L, ts("2024-01-01 11:00:00")), // after tie → highest id wins
    (203L, 2L, ts("2024-01-01 12:00:00"))) // keyless user → null
    .toDF("event_id", "user_id", "ts")

  test("asofJoin picks the latest right row at-or-before, ties by id") {
    val got = AsOf.asofJoin(purchases, clicks, "user_id", "ts",
        payload = Seq("click_id", "click_value"), tiebreak = "click_id")
      .select("event_id", "click_id", "click_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(got(200L) == (None, None))
    assert(got(201L) == (Some(100L), Some(1.0)))
    assert(got(202L) == (Some(102L), Some(3.0)))
    assert(got(203L) == (None, None))
  }

  test("asofJoin preserves duplicate left rows") {
    val dupLeft = purchases.union(purchases)
    val n = AsOf.asofJoin(dupLeft, clicks, "user_id", "ts",
      Seq("click_id"), "click_id").count()
    assert(n == 8)
  }

  test("bandedRangeJoin width guard inspects literals without a Spark job") {
    // constant widths fold to a driver-inspectable literal
    assert(AsOf.widthUpperBoundSeconds(spark, expr("INTERVAL 1 HOUR"))
      .contains(3600.0))
    assert(AsOf.widthUpperBoundSeconds(spark, expr("INTERVAL 2 DAY"))
      .contains(2 * 86400.0))
    // year-month widths bound at 31-day months (conservative)
    assert(AsOf.widthUpperBoundSeconds(spark, expr("INTERVAL 1 MONTH"))
      .contains(31 * 86400.0))
    // a data-dependent width can't be analyzed against range(1): the
    // AnalysisException is swallowed and ONLY that → guard skipped
    assert(AsOf.widthUpperBoundSeconds(spark, col("some_data_col")).isEmpty)
    // a width that RESOLVES against range(1)'s own `id` column folds only
    // partially — its inner interval literal must NOT leak out as the
    // bound (the expression is not constant, so no bound at all)
    assert(AsOf.widthUpperBoundSeconds(spark,
      expr("INTERVAL 1 HOUR") * col("id")).isEmpty)
    assert(AsOf.widthUpperBoundSeconds(spark,
      when(col("id") > 0, expr("INTERVAL 1 HOUR"))
        .otherwise(expr("INTERVAL 9 HOUR"))).isEmpty)
    // undersized bucketSeconds is rejected at construction time
    val ex = intercept[IllegalArgumentException] {
      AsOf.bandedRangeJoin(purchases, clicks, "user_id", "ts",
        expr("INTERVAL 1 HOUR"), bucketSeconds = 60)
    }
    assert(ex.getMessage.contains("bucketSeconds"))
  }

  test("bandedRangeJoin matches the exact (ts, ts+width] interval only") {
    val joined = AsOf.bandedRangeJoin(
      purchases, clicks.withColumnRenamed("click_id", "event_id2"),
      "user_id", "ts", expr("INTERVAL 1 HOUR"), bucketSeconds = 3600L)
    val pairs = joined.select($"event_id", $"r_event_id2")
      .as[(Long, Long)].collect().toSet
    // 200 @09:59 → clicks 10:00,10:30,10:30 all within (09:59,10:59]
    // 201 @10:00 → strict lower bound excludes 10:00; 10:30 pair matches
    // 202 @11:00, 203 user 2 → nothing
    assert(pairs == Set((200L, 100L), (200L, 101L), (200L, 102L),
      (201L, 101L), (201L, 102L)))
  }

  test("bandedRangeJoin crosses band boundaries (b-1 replication)") {
    // left at 10:59, right at 11:30: different hour buckets, still in range
    val l = Seq((1L, 9L, ts("2024-01-01 10:59:00"))).toDF("id", "k", "ts")
    val r = Seq((2L, 9L, ts("2024-01-01 11:30:00"), 5.0))
      .toDF("rid", "k", "ts", "v")
    val got = AsOf.bandedRangeJoin(l, r, "k", "ts",
      expr("INTERVAL 1 HOUR"), 3600L).count()
    assert(got == 1)
  }

  test("asofJoin agrees with the brute-force definition on random data") {
    // seeded RNG: deterministic, but dense key/ts collisions stress the
    // tie-break path (ts drawn from just 20 values per key)
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300) { i =>
      (i.toLong, rnd.nextInt(8).toLong,
        ts(f"2024-01-01 10:${rnd.nextInt(20)}%02d:00"))
    }.toDF("event_id", "user_id", "ts")
    val right = Seq.tabulate(300) { i =>
      (1000L + i, rnd.nextInt(8).toLong,
        ts(f"2024-01-01 10:${rnd.nextInt(20)}%02d:00"), rnd.nextDouble())
    }.toDF("click_id", "user_id", "ts", "v")

    val got = AsOf.asofJoin(left, right, "user_id", "ts",
        Seq("click_id", "v"), "click_id")
      .select("event_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap

    val ls = left.as[(Long, Long, Timestamp)].collect()
    val rs = right.as[(Long, Long, Timestamp, Double)].collect()
    ls.foreach { case (id, k, t) =>
      val want = rs.filter(r => r._2 == k && !r._3.after(t))
        .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._1)
      assert(got(id) == want, s"event $id: got ${got(id)}, want $want")
    }
  }

  test("forward asofJoin agrees with the brute-force definition") {
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(300) { i =>
      (i.toLong, rnd.nextInt(8).toLong,
        ts(f"2024-01-01 10:${rnd.nextInt(20)}%02d:00"))
    }.toDF("event_id", "user_id", "ts")
    val right = Seq.tabulate(300) { i =>
      (1000L + i, rnd.nextInt(8).toLong,
        ts(f"2024-01-01 10:${rnd.nextInt(20)}%02d:00"), rnd.nextDouble())
    }.toDF("click_id", "user_id", "ts", "v")

    val got = AsOf.asofJoin(left, right, "user_id", "ts",
        Seq("click_id", "v"), "click_id", direction = "forward")
      .select("event_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap

    val ls = left.as[(Long, Long, Timestamp)].collect()
    val rs = right.as[(Long, Long, Timestamp, Double)].collect()
    ls.foreach { case (id, k, t) =>
      // smallest ts >= left ts; at equal nearest ts the GREATEST tiebreak
      // wins (same convention as backward)
      val want = rs.filter(r => r._2 == k && !r._3.before(t))
        .sortBy(r => (r._3.getTime, -r._1)).headOption.map(_._1)
      assert(got(id) == want, s"event $id: got ${got(id)}, want $want")
    }
  }

  test("asofJoin tolerance nulls matches farther than the bound") {
    val got = AsOf.asofJoin(purchases, clicks, "user_id", "ts",
        Seq("click_id"), "click_id",
        tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .select("event_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(201L) == Some(100L)) // 10:00 click, 0 min away
    assert(got(202L) == None)       // nearest click 30 min back > 10 min
    assert(got(200L) == None && got(203L) == None)
  }

  test("bandedRangeJoin agrees with the naive theta join on random data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(200) { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        ts(f"2024-01-01 ${10 + rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("event_id", "user_id", "ts")
    val right = Seq.tabulate(200) { i =>
      (1000L + i, rnd.nextInt(5).toLong,
        ts(f"2024-01-01 ${10 + rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("rid", "user_id", "ts")

    val got = AsOf.bandedRangeJoin(left, right, "user_id", "ts",
        expr("INTERVAL 1 HOUR"), 3600L)
      .select($"event_id", $"r_rid").as[(Long, Long)].collect().toSet

    val want = (for {
      (lid, lk, lt) <- left.as[(Long, Long, Timestamp)].collect()
      (rid, rk, rt) <- right.as[(Long, Long, Timestamp)].collect()
      if lk == rk && rt.after(lt) &&
        rt.getTime <= lt.getTime + 3600L * 1000
    } yield (lid, rid)).toSet
    assert(got == want)
  }

  test("approx_count_distinct tracks exact distinct within its rsd") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
    val got = ev.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx"))
      .as[(Long, Long)].head()
    assert(math.abs(got._1 - got._2).toDouble / got._1 < 0.1)
  }
}

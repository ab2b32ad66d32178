package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.etl.Skew

/** Salting must be invisible in the results — bit-identical to the plain
  * groupBy/join it replaces (the whole point of the technique).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def li = spark.read.parquet(s"$sf001/lineitem.parquet")

  test("saltedAgg == plain groupBy (count + exact decimal sum)") {
    val got = Skew.saltedAgg(li, Seq("l_returnflag"),
      det = col("l_orderkey"), salts = 16,
      aggs = Seq(count(lit(1)).as("__n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("__rev")),
      merges = Seq(sum("__n").as("n"),
        sum("__rev").as("rev")))
      .orderBy("l_returnflag")
      .as[(String, Long, BigDecimal)].collect().toSeq
    val exp = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("rev"))
      .orderBy("l_returnflag")
      .as[(String, Long, BigDecimal)].collect().toSeq
    assert(got == exp)
  }

  test("saltedJoin == plain join (same rows per label)") {
    val dim = Seq(("A", "accepted"), ("N", "neutral"), ("R", "returned"))
      .toDF("flag", "label")
    val got = Skew.saltedJoin(li, dim, "l_returnflag", "flag",
      det = col("l_orderkey"), salts = 8)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val exp = li.join(dim, col("l_returnflag") === col("flag"))
      .groupBy("label").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == exp)
  }

  test("autoSalts scales with rows and heavy-key share, floored and capped") {
    // small inputs keep the historical salts=8 plan
    assert(Skew.autoSalts(600000L) == 8)
    assert(Skew.autoSalts(600000L, heavyKeyShare = 0.5) == 8)
    // 60M rows, one key owns half → 30M / 2M-per-task = 15 salts
    assert(Skew.autoSalts(60000000L, heavyKeyShare = 0.5) == 15)
    // full-skew worst case: 60M / 2M = 30
    assert(Skew.autoSalts(60000000L) == 30)
    // 100 TB-class row counts hit the replication cap
    assert(Skew.autoSalts(400000000000L) == 4096)
    intercept[IllegalArgumentException] { Skew.autoSalts(10L, 0.0) }
  }

  test("salt is deterministic and in range") {
    val s = li.select(Skew.salt(col("l_orderkey"), 16).as("s"))
    val mm = s.agg(min("s"), max("s")).first()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 16)
    assert(s.distinct().count() > 1) // actually spreads
    val a = s.collect().map(_.getInt(0)).toSeq
    val b = li.select(Skew.salt(col("l_orderkey"), 16).as("s"))
      .collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }
}

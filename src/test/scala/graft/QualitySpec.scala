package graft

import graft.ops.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), -5.0),   // out of range
    (2L, None, 20.0),        // duplicate id + null name
    (4L, Some("z"), 30.0))   // value not accepted
    .toDF("id", "name", "v")

  test("report evaluates every rule in one pass, failures measured") {
    val out = Quality.report(df, Seq(
        Quality.rowCount(min = 1, max = 10),
        Quality.notNull("name", maxFrac = 0.1),
        Quality.unique(Seq("id")),
        Quality.accepted("name", Seq("a", "b")),
        Quality.inRange("v", 0.0, 100.0)))
      .as[(String, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("row_count") == ((4.0, 1)))
    assert(out("unique:id") == ((1.0, 0)))
    assert(out("accepted:name") == ((1.0, 0)))
    assert(out("in_range:v") == ((1.0, 0)))
    val (nullFrac, nullPass) = out("not_null:name")
    assert(math.abs(nullFrac - 0.25) < 1e-4 && nullPass == 0)
    // loosened thresholds flip to pass without changing metrics
    val loose = Quality.report(df, Seq(Quality.notNull("name", 0.5)))
      .as[(String, Double, Int)].collect().head
    assert(loose._3 == 1)
  }

  test("report is null-safe: empty table and null keys") {
    // empty input: every violation-counting rule passes vacuously,
    // row_count(min=1) is the one that fails — no NPE
    val empty = df.filter($"id" < 0)
    val out = Quality.report(empty, Seq(
        Quality.rowCount(min = 1),
        Quality.accepted("name", Seq("a")),
        Quality.inRange("v", 0.0, 1.0),
        Quality.unique(Seq("id")),
        Quality.notNull("name")))
      .as[(String, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("row_count") == ((0.0, 0)))
    assert(out("accepted:name") == ((0.0, 1)))
    assert(out("in_range:v") == ((0.0, 1)))
    assert(out("unique:id") == ((0.0, 1)))
    assert(out("not_null:name")._1 <= 1e-6 && out("not_null:name")._2 == 1)
    // null keys follow COUNT(DISTINCT) semantics: they are NOT dups
    val nulls = Seq((Some(1L), "x"), (None, "y"), (None, "z"))
      .toDF("id", "name")
    val u = Quality.report(nulls, Seq(Quality.unique(Seq("id"))))
      .as[(String, Double, Int)].collect().head
    assert(u == (("unique:id", 0.0, 1)))
  }

  test("fkIntegrity counts orphans, ignores null keys, passes when clean") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val bad = Quality.fkIntegrity(child, Seq("fk"), parent, Seq("pk"))
      .as[(String, Double, Int)].collect().head
    assert(bad == (("fk:fk", 1.0, 0)))
    val ok = Quality.fkIntegrity(child.filter($"fk" =!= 9L || $"fk".isNull),
        Seq("fk"), parent, Seq("pk"))
      .as[(String, Double, Int)].collect().head
    assert(ok._3 == 1)
  }
}

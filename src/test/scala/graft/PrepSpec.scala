package graft

import org.apache.spark.sql.functions._
import graft.prep.{Prep, TableSpec}

/** Prep layer (reference data_prep reconstruction): normalization, geo
  * parsing, coercion, padding, dedup, header-drift resolution. Fixture
  * shapes follow FIXTURES.md §1 (INSEE long format). */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeName snake_cases headers") {
    assert(Prep.normalizeName("OBS_VALUE") == "obs_value")
    assert(Prep.normalizeName("codesPostaux") == "codes_postaux")
    assert(Prep.normalizeName("  Département Nom ") == "d_partement_nom")
    assert(Prep.normalizeName("TIME_PERIOD") == "time_period")
  }

  test("normalizeHeaders applies rename map after normalization") {
    val df = Seq(("2024-DEP-59", 100.0)).toDF("GEO", "OBS_VALUE")
    val out = Prep.normalizeHeaders(df, Map("obs_value" -> "population"))
    assert(out.columns.toSeq == Seq("geo", "population"))
  }

  test("enrichGeo parses YYYY-LEVEL-CODE ids") {
    val df = Seq("2024-DEP-59", "2021-COM-59350", "garbage").toDF("geo")
    val out = Prep.enrichGeo(df).collect().map(r =>
      (r.getAs[Any]("geo_reference_year"), r.getAs[String]("geo_level_code"),
        r.getAs[String]("geo_code")))
    assert(out(0) == (2024, "DEP", "59"))
    assert(out(1) == (2021, "COM", "59350"))
    assert(out(2) == (null, "", "")) // no match → empty extract, null year
  }

  test("coerceNumeric nulls invalid values (pandas errors='coerce')") {
    val df = Seq("12.5", "x", "").toDF("obs_value")
    val out = Prep.coerceNumeric(df, Seq("obs_value")).collect().map(_.get(0))
    assert(out.toSeq == Seq(12.5, null, null))
  }

  test("zfill pads department codes") {
    val df = Seq("2", "59").toDF("departement")
    val out = Prep.zfill(df, Map("departement" -> 2)).as[String].collect()
    assert(out.toSeq == Seq("02", "59"))
  }

  test("resolveColumn tolerates header drift case-insensitively") {
    val df = Seq((1, 2)).toDF("EMPSTA_ENQ", "obs")
    assert(Prep.resolveColumn(df, Seq("empsta", "empsta_enq")) == Some("EMPSTA_ENQ"))
    assert(Prep.resolveColumn(df, Seq("missing")) == None)
  }

  test("prepare runs the full chain with dedup and lineage") {
    val raw = Seq(
      ("2024-DEP-59", "2021", "100.5", "59"),
      ("2024-DEP-59", "2021", "100.5", "59"), // dup
      ("2024-DEP-02", "2021", "bad", "2"))
      .toDF("GEO", "TIME_PERIOD", "OBS_VALUE", "DEPARTEMENT")
    val spec = TableSpec("stg_population",
      renameMap = Map("obs_value" -> "population"),
      numericCols = Seq("population"), intCols = Seq("time_period"),
      padCols = Map("departement" -> 2), geoCol = Some("geo"))
    val out = Prep.prepare(raw, spec, "population.csv").cache()
    assert(out.count() == 2)
    assert(out.columns.contains("geo_code") && out.columns.contains("source_file"))
    val r59 = out.filter($"geo_code" === "59").first()
    assert(r59.getAs[Double]("population") == 100.5)
    assert(r59.getAs[Int]("time_period") == 2021)
    assert(out.filter($"geo_code" === "02").first().getAs[Any]("population") == null)
    assert(out.filter($"departement" === "02").count() == 1) // zfilled
  }
}

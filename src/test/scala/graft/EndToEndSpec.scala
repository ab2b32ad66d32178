package graft

import org.apache.spark.sql.functions._
import graft.etl.{Etl, Seeds}
import graft.marts.Datamarts
import graft.prep.{Prep, TableSpec}
import graft.sources.Sources

/** SURVEY §7.3 minimum end-to-end slice — the E5 guide's canonical query:
  * "population, naissances, taux_natalite for Nord in 2021", from raw
  * CSV/JSON fixtures through prep → dims → facts → datamart view.
  * Fixture shapes follow FIXTURES.md (INSEE long format; communes doc).
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-e2e").toString

  private def writeFixtures(): Unit = {
    // population_hauts_de_france.csv (FIXTURES §1)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/population.csv"),
      """GEO;PCS;SEX;TIME_PERIOD;RP_MEASURE;AGE;OBS_VALUE;DEPARTEMENT
        |2024-DEP-59;_T;_T;2021;POP;_T;2608346;59
        |2024-DEP-59;_T;_T;2015;POP;_T;2603472;59
        |2024-DEP-02;_T;_T;2021;POP;_T;529374;2
        |2024-DEP-02;_T;_T;2021;POP;_T;529374;2
        |""".stripMargin)
    // naissances / deces (EC_MEASURE LVB/DTH)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/naissances.csv"),
      """GEO;EC_MEASURE;FREQ;TIME_PERIOD;OBS_VALUE;DEPARTEMENT
        |2024-DEP-59;LVB;A;2021;31401;59
        |2024-DEP-02;LVB;A;2021;5214;2
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/deces.csv"),
      """GEO;EC_MEASURE;FREQ;TIME_PERIOD;OBS_VALUE;DEPARTEMENT
        |2024-DEP-59;DTH;A;2021;23193;59
        |2024-DEP-02;DTH;A;2021;5466;2
        |""".stripMargin)
    // communes.json (FIXTURES §2, nested with array + struct)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/communes.json"),
      """{"source":"geo.api.gouv.fr","departements":["02","59"],"commune_count":2,
        |"communes":[
        | {"nom":"Lille","code":"59350","codesPostaux":["59000","59800"],
        |  "codeDepartement":"59","departement_nom":"Nord","codeRegion":"32",
        |  "region_nom":"Hauts-de-France","population":236234,"surface":3483.0,
        |  "longitude":3.04,"latitude":50.63,
        |  "contour_geojson":{"type":"Polygon","coordinates":[[[3.0,50.6]]]}},
        | {"nom":"Laon","code":"02408","codesPostaux":["02000"],
        |  "codeDepartement":"02","departement_nom":"Aisne","codeRegion":"32",
        |  "region_nom":"Hauts-de-France","population":24876,"surface":4200.0,
        |  "longitude":3.62,"latitude":49.56,
        |  "contour_geojson":{"type":"Polygon","coordinates":[[[3.6,49.5]]]}}
        |]}""".stripMargin)
  }

  private val popSpec = TableSpec("stg_population",
    renameMap = Map("obs_value" -> "population", "time_period" -> "annee"),
    numericCols = Seq("population"), intCols = Seq("annee"),
    padCols = Map("departement" -> 2), geoCol = Some("geo"))
  private val evtSpec = TableSpec("stg_evenements",
    renameMap = Map("obs_value" -> "valeur", "time_period" -> "annee"),
    numericCols = Seq("valeur"), intCols = Seq("annee"),
    padCols = Map("departement" -> 2), geoCol = Some("geo"))

  test("E5 canonical query: population, naissances, taux_natalite for Nord 2021") {
    writeFixtures()
    val dims = Seeds.all(spark)
    val dimTemps = dims("dim_temps")
    val dimGeo = dims("dim_geographie")

    def prepCsv(file: String, spec: TableSpec) =
      Prep.prepare(Sources.csv(spark, s"$tmp/$file", delimiter = ";"), spec, file)

    // staging → fact with dim-key broadcast joins + null-key rejection
    val stgPop = prepCsv("population.csv", popSpec)
      .filter($"pcs" === "_T" && $"sex" === "_T" && $"age" === "_T")
    val faitPopulation = Etl.requireKeys(
      Etl.dimKeyJoin(
        Etl.dimKeyJoin(stgPop, dimTemps, Seq("annee"), "temps_id"),
        dimGeo.withColumnRenamed("departement_code", "departement"),
        Seq("departement"), "geo_id"),
      Seq("temps_id", "geo_id"))
      .select($"temps_id", $"geo_id", $"population")

    val naiss = prepCsv("naissances.csv", evtSpec)
      .withColumnRenamed("valeur", "naissances")
    val deces = prepCsv("deces.csv", evtSpec)
      .withColumnRenamed("valeur", "deces")
    // births ∪ deaths as one fact set — full outer by (annee, departement)
    // (SURVEY U2: replaces the reference's O(n²) match-or-append loop)
    val evt = naiss.select($"annee", $"departement", $"naissances")
      .join(deces.select($"annee", $"departement", $"deces"),
        Seq("annee", "departement"), "full_outer")
    val faitEvenements = Etl.requireKeys(
      Etl.dimKeyJoin(
        Etl.dimKeyJoin(evt, dimTemps, Seq("annee"), "temps_id"),
        dimGeo.withColumnRenamed("departement_code", "departement"),
        Seq("departement"), "geo_id"),
      Seq("temps_id", "geo_id"))
      .select($"temps_id", $"geo_id", $"naissances", $"deces")

    // FK integrity (reference orphan tests)
    assert(Etl.orphanCount(faitPopulation, dimTemps, "temps_id", "temps_id") == 0)

    val dm = Datamarts.demographieDepartement(
      faitPopulation, faitEvenements, dimTemps, dimGeo)
    val nord = dm.filter($"annee" === 2021 && $"departement_nom" === "Nord").first()

    assert(nord.getAs[Double]("population_totale") == 2608346.0)
    assert(nord.getAs[Double]("naissances") == 31401.0)
    assert(nord.getAs[Double]("solde_naturel") == 31401.0 - 23193.0)
    val natalite = nord.getAs[Double]("taux_natalite")
    assert(math.abs(natalite - 31401.0 * 1000 / 2608346.0) < 1e-9)
    // dedup in prep collapsed the duplicated 02 row
    assert(dm.filter($"annee" === 2021 && $"departement_code" === "02").first()
      .getAs[Double]("population_totale") == 529374.0)
    // 2015 has population but no events → left join keeps the row, null rate
    val n2015 = dm.filter($"annee" === 2015 && $"departement_code" === "59").first()
    assert(n2015.getAs[Any]("naissances") == null)
  }

  test("full lifecycle: config → staged run → stats → compaction → backup → notify") {
    writeFixtures()
    import graft.etl.{EtlConfig, EtlNotifier, EtlRunner}
    import graft.etl.EtlRunner.Stage
    import graft.ops.{Backup, Compaction, Stats}

    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // reference §3.1 step 1: config resolution (CLI beats defaults)
    val cfg = EtlConfig.resolve(
      cli = EtlConfig.parseArgs(Seq("--warehouse_dir", wh)),
      defaults = Map("warehouse_dir" -> "/nonexistent",
        "log_path" -> s"$wh/log", "backup_root" -> s"$wh/backup"))
    assert(cfg("warehouse_dir") == wh)
    val dims = Seeds.all(spark)
    val sent = scala.collection.mutable.ArrayBuffer[(String, String)]()
    spark.sql("DROP TABLE IF EXISTS fait_population_e2e")

    // steps 2-7: the staged pipeline under the runner, with the
    // maintenance/backup analogues in their reference positions
    val reports = EtlRunner.run(spark, cfg("log_path"), Seq(
      Stage("staging", Nil, () => {
        val stg = Prep.prepare(
          Sources.csv(spark, s"$tmp/population.csv", delimiter = ";"),
          popSpec, "population.csv")
        // deliberately fragmented write; the maintenance stage compacts
        Sources.writeParquet(stg.repartition(8), s"$wh/stg_population")
        stg.count()
      }),
      Stage("facts", Seq("staging"), () => {
        val stg = spark.read.parquet(s"$wh/stg_population")
        val fact = Etl.requireKeys(
          Etl.dimKeyJoin(stg, dims("dim_temps"), Seq("annee"), "temps_id"),
          Seq("temps_id"))
        fact.write.mode("overwrite").saveAsTable("fait_population_e2e")
        spark.table("fait_population_e2e").count()
      }),
      Stage("refresh", Seq("facts"), () => {
        Stats.refreshStatistics(spark, Seq("fait_population_e2e"))
        spark.table("fait_population_e2e").count()
      }),
      Stage("maintenance", Seq("staging"), () =>
        Compaction.compact(spark, s"$wh/stg_population")
          .map(_.filesBefore.toLong).sum),
      Stage("backup", Seq("facts"), () => {
        Backup.snapshot(spark, s"$wh/stg_population", cfg("backup_root"),
          "20260812_000000")
        1L
      })),
      sinks = Seq(
        EtlNotifier.transport("pipeline", (s, b) => sent += ((s, b))),
        EtlNotifier.table(spark, s"$wh/report", "pipeline")))
    try {
      assert(reports.size == 5 && reports.forall(_.status == "SUCCES"))
      // notification fired with the success outcome
      assert(sent.size == 1 && sent.head._1.contains("SUCCES"))
      // CBO stats recorded by the refresh stage
      assert(spark.sql("DESCRIBE TABLE EXTENDED fait_population_e2e")
        .filter($"col_name" === "Statistics").count() == 1)
      // the maintenance stage compacted staging's 8 files down to 1
      assert(new java.io.File(s"$wh/stg_population").listFiles()
        .count(_.getName.endsWith(".parquet")) == 1)
      // backup snapshot exists under the configured root
      assert(new java.io.File(
        s"${cfg("backup_root")}/snapshot_20260812_000000").isDirectory)
      // ops log + report table each carry one row per stage
      assert(spark.read.parquet(cfg("log_path")).count() == 5)
      assert(spark.read.parquet(s"$wh/report").count() == 5)
    } finally spark.sql("DROP TABLE IF EXISTS fait_population_e2e")
  }

  test("communes JSON: flatten + postal-code bridge (S3, array explode)") {
    writeFixtures()
    val doc = Sources.json(spark, s"$tmp/communes.json")
    val flat = Sources.flattenCommunes(doc).cache()
    assert(flat.count() == 2)
    val lille = flat.filter($"commune_code" === "59350").first()
    assert(lille.getAs[String]("codes_postaux") == "59000,59800")
    assert(lille.getAs[String]("contour_geojson").contains("Polygon"))
    assert(lille.getAs[Double]("longitude") == 3.04)
    val bridge = Sources.communePostalBridge(doc)
    assert(bridge.count() == 3)
    assert(bridge.filter($"commune_code" === "59350").count() == 2)
  }

  test("dimension seeds match the reference vocabulary (FIXTURES §3)") {
    val dims = Seeds.all(spark)
    assert(dims("dim_temps").count() == 15)
    assert(dims("dim_temps").filter($"est_recensement").count() == 3)
    assert(dims("dim_geographie").count() == 5)
    assert(dims("dim_geographie").select("departement_code").as[String]
      .collect().toSet == Set("02", "59", "60", "62", "80"))
    assert(dims("dim_demographie").filter($"dimension_type" === "SEXE").count() == 3)
    assert(dims("dim_demographie").filter($"dimension_type" === "PCS").count() == 9)
    assert(dims("dim_activite").filter($"dimension_type" === "NAF").count() >= 10)
    assert(dims("dim_indicateur").count() == 10)
    // surrogate keys: dense, deterministic, start at 1
    val keys = dims("dim_geographie").select("geo_id").as[Int].collect().sorted
    assert(keys.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("driver-side fetch source parallelizes page payloads (S4)") {
    val pages = Seq(
      """{"region":"32","duree":15,"taux":3.45}""",
      """{"region":"32","duree":20,"taux":3.62}""")
    val df = Sources.fetched(spark, pages)
    assert(df.count() == 2)
    assert(df.filter($"duree" === 20).first().getAs[Double]("taux") == 3.62)
  }
}

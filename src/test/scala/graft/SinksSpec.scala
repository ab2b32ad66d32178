package graft

import org.apache.spark.sql.functions._
import graft.security.AccessAudit
import graft.sources.Sources

/** Sink round-trips (S7-S11), catalog table write (S8), and the J10
  * access-audit multi-way join. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "name", "v")

  test("parquet / json / csv sinks round-trip") {
    val root = java.nio.file.Files.createTempDirectory("graft-sinks").toString
    Sources.writeParquet(sample, s"$root/p")
    Sources.writeJson(sample, s"$root/j")
    Sources.writeCsv(sample, s"$root/c")
    assert(spark.read.parquet(s"$root/p").count() == 2)
    val j = spark.read.json(s"$root/j")
    assert(j.filter($"id" === 2).first().getAs[Double]("v") == 2.5)
    val c = Sources.csv(spark, s"$root/c")
    assert(c.columns.toSeq == Seq("id", "name", "v") && c.count() == 2)
    Sources.writeOrc(sample, s"$root/o")
    val o = Sources.orc(spark, s"$root/o")
    // files read back nullable; compare names + types
    assert(o.schema.map(f => (f.name, f.dataType)) ==
      sample.schema.map(f => (f.name, f.dataType)))
    assert(o.count() == 2)
  }

  test("excel sink writes a well-formed xlsx with typed cells (S10)") {
    import graft.sources.ExcelSink
    val path = java.nio.file.Files.createTempDirectory("graft-xlsx")
      .resolve("taux.xlsx").toString
    val df = Seq(
      ("Livret A", 3.0, 2024, true),
      ("LEP <&> spécial", 5.0, 2024, false))
      .toDF("produit", "taux", "annee", "actif")
    ExcelSink.writeExcel(df, path, sheet = "Taux")

    val zip = new java.util.zip.ZipFile(path)
    try {
      def entry(n: String): String = {
        val is = zip.getInputStream(zip.getEntry(n))
        try new String(is.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally is.close()
      }
      // all mandatory OOXML parts present
      Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml")
        .foreach(n => assert(zip.getEntry(n) != null, s"missing part $n"))
      assert(entry("xl/workbook.xml").contains("""name="Taux""""))
      val sheet = entry("xl/worksheets/sheet1.xml")
      // header + escaped string + number + boolean cells
      assert(sheet.contains("<is><t>produit</t></is>"))
      assert(sheet.contains("<is><t>LEP &lt;&amp;&gt; spécial</t></is>"))
      assert(sheet.contains("""<c r="B2"><v>3.0</v></c>"""))
      assert(sheet.contains("""<c r="D3" t="b"><v>0</v></c>"""))
      assert(sheet.contains("""<row r="3">"""))
    } finally zip.close()
    // the row-bound contract: this is a report sink, not a distributed one
    val big = spark.range(0, 50).toDF("n")
    val ex = intercept[IllegalArgumentException] {
      ExcelSink.writeExcel(big, path, maxRows = 10)
    }
    assert(ex.getMessage.contains("driver-side report sink"))
  }

  test("Excel sink: NaN/Infinity become strings, quotes escape in attrs") {
    import graft.sources.ExcelSink
    val path = java.nio.file.Files.createTempDirectory("graft-xlsx-nan")
      .resolve("nan.xlsx").toString
    val df = Seq(("ok", 1.5), ("nan", Double.NaN),
      ("inf", Double.PositiveInfinity)).toDF("k", "v")
    ExcelSink.writeExcel(df, path, sheet = """Rapport "Q1" <2024>""")
    val zip = new java.util.zip.ZipFile(path)
    try {
      def entry(n: String): String = {
        val is = zip.getInputStream(zip.getEntry(n))
        try new String(is.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally is.close()
      }
      val sheet = entry("xl/worksheets/sheet1.xml")
      assert(sheet.contains("""<c r="B2"><v>1.5</v></c>"""))
      // non-finite doubles are NOT numeric cells (invalid SpreadsheetML)
      assert(!sheet.contains("<v>NaN</v>") && !sheet.contains("<v>Infinity</v>"))
      assert(sheet.contains("<is><t>NaN</t></is>"))
      assert(sheet.contains("<is><t>Infinity</t></is>"))
      // quote escaped inside the sheet-name attribute
      val wb = entry("xl/workbook.xml")
      assert(wb.contains("name=\"Rapport &quot;Q1&quot; &lt;2024&gt;\""))
      // both XML parts stay well-formed
      Seq(wb, sheet).foreach { xml =>
        javax.xml.parsers.DocumentBuilderFactory.newInstance()
          .newDocumentBuilder()
          .parse(new java.io.ByteArrayInputStream(
            xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    } finally zip.close()
  }

  test("relational batch sink: saveAsTable + catalog read-back (S8)") {
    sample.write.mode("overwrite").saveAsTable("stg_sample")
    try {
      assert(spark.table("stg_sample").count() == 2)
      // append mode (the reference's if_exists='append' path)
      sample.write.mode("append").saveAsTable("stg_sample")
      assert(spark.table("stg_sample").count() == 4)
    } finally spark.sql("DROP TABLE IF EXISTS stg_sample")
  }

  test("access-audit view joins employes, agences and aggregated zones (J10)") {
    val employes = Seq(
      ("jean.dupont", 1, "DIRECTEUR_AGENCE"),
      ("sophie.martin", 1, "DIRECTEUR_REGIONAL"),
      ("no.zones", 2, "COLLABORATEUR"))
      .toDF("login", "agence_id", "role")
    val agences = Seq((1, "Lille", "GRANDE"), (2, "Laon", "PETITE"))
      .toDF("agence_id", "nom", "classe")
    val zones = Seq(
      ("jean.dupont", Some("59")), ("jean.dupont", Some("62")),
      ("sophie.martin", None: Option[String]))
      .toDF("login", "departement_code")
    val audit = AccessAudit.employeeAccess(employes, agences, zones).cache()
    val jd = audit.filter($"login" === "jean.dupont").first()
    assert(jd.getAs[String]("zones_autorisees") == "59, 62")
    assert(jd.getAs[String]("agence_nom") == "Lille")
    assert(audit.filter($"login" === "sophie.martin").first()
      .getAs[String]("zones_autorisees") == "REGION_ENTIERE")
    assert(audit.filter($"login" === "no.zones").first()
      .getAs[String]("zones_autorisees") == "NON_ENREGISTRE")
  }
}

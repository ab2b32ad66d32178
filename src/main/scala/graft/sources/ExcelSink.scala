package graft.sources

import org.apache.spark.sql.DataFrame

/** S10 Excel sink — the reference's rate-scraper report
  * (`ingestion/Scraping/scrape_taux.py:126-130`, `df.to_excel`).
  *
  * Like the reference's pandas call this is a DRIVER-SIDE report writer
  * for small result tables (scraped rates, monitoring summaries) — NOT a
  * distributed sink; `maxRows` enforces that contract explicitly. The
  * file is a dependency-free minimal OOXML package (an xlsx is a zip of
  * SpreadsheetML parts): numbers/booleans land as native cell types,
  * everything else as inline strings, so spreadsheet tools open it
  * directly. Distributed exports belong in the parquet/csv sinks.
  */
object ExcelSink {

  def writeExcel(df: DataFrame, path: String, sheet: String = "Sheet1",
      maxRows: Int = 100000): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"writeExcel is a driver-side report sink (reference to_excel " +
        s"parity); got more than $maxRows rows — use the parquet/csv " +
        "sinks for distributed exports")
    val header = df.columns.toIndexedSeq

    // full XML escape (quotes matter in attribute context — sheet names);
    // control chars are illegal in XML 1.0 and dropped
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&apos;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }
    def isFinite(v: Any): Boolean = v match {
      case d: Double => !d.isNaN && !d.isInfinite
      case f: Float => !f.isNaN && !f.isInfinite
      case _ => true
    }
    def colRef(i: Int): String = { // 0 -> A, 25 -> Z, 26 -> AA ...
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def cell(r: Int, c: Int, v: Any): String = {
      val ref = s"${colRef(c)}${r + 1}"
      v match {
        case null => ""
        // NaN/Infinity are not valid SpreadsheetML numbers — they fall
        // through to the inline-string branch below
        case n @ (_: Int | _: Long | _: Double | _: Float | _: Short |
                  _: Byte | _: java.math.BigDecimal) if isFinite(n) =>
          s"""<c r="$ref"><v>$n</v></c>"""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case s => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s.toString)}</t></is></c>"""
      }
    }
    val sheetRows = new StringBuilder
    sheetRows ++= s"""<row r="1">${header.indices
      .map(c => cell(0, c, header(c))).mkString}</row>"""
    rows.zipWithIndex.foreach { case (row, i) =>
      sheetRows ++= s"""<row r="${i + 2}">${header.indices
        .map(c => cell(i + 1, c, row.get(c))).mkString}</row>"""
    }
    val parts: Seq[(String, String)] = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${esc(sheet)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$sheetRows</sheetData>
           |</worksheet>""".stripMargin)

    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path)))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}

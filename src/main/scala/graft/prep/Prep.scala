package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source preparation spec — the reconstruction of the reference's
  * missing `analytics/lib/data_prep.py` (behavior per
  * `data_preparation.ipynb#cell4-#cell9` and `docs/architecture.md:57-60`):
  * rename maps, numeric coercion, zero-padding, geo-id parsing, dedup,
  * lineage columns, and a pluggable extra transform.
  */
final case class TableSpec(
    name: String,
    renameMap: Map[String, String] = Map.empty,
    numericCols: Seq[String] = Nil,
    intCols: Seq[String] = Nil,
    padCols: Map[String, Int] = Map.empty,
    dedupSubset: Option[Seq[String]] = None, // None = full-row distinct
    geoCol: Option[String] = None,
    extraTransform: Option[DataFrame => DataFrame] = None)

object Prep {

  /** snake_case normalization of a header (reference `normalize_name`,
    * `data_preparation.ipynb#cell4`): trim, non-alnum runs → `_`,
    * camelCase boundary → `_`, lowercase, squeeze/strip underscores. */
  def normalizeName(s: String): String =
    s.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("_+", "_")
      .replaceAll("^_|_$", "")
      .toLowerCase

  /** Normalize all headers, then apply the per-source rename map. */
  def normalizeHeaders(df: DataFrame, renameMap: Map[String, String] = Map.empty): DataFrame = {
    val normed = df.toDF(df.columns.toIndexedSeq.map(normalizeName): _*)
    renameMap.foldLeft(normed) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
  }

  /** Parse `2024-DEP-59`-style geo ids into reference year, level code and
    * bare code (reference `enrich_geo_columns`). */
  def enrichGeo(df: DataFrame, geoCol: String = "geo"): DataFrame = {
    val g = col(geoCol)
    df.withColumn("geo_reference_year",
        regexp_extract(g, "^(\\d+)-([A-Z]+)-(.+)$", 1).try_cast("int"))
      .withColumn("geo_level_code", regexp_extract(g, "^(\\d+)-([A-Z]+)-(.+)$", 2))
      .withColumn("geo_code", regexp_extract(g, "^(\\d+)-([A-Z]+)-(.+)$", 3))
  }

  /** `pd.to_numeric(errors='coerce')` ≡ try_cast: invalid → null. */
  def coerceNumeric(df: DataFrame, cols: Seq[String], to: String = "double"): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df)((d, c) =>
      d.withColumn(c, col(c).try_cast(to)))

  /** zfill: left-pad codes (department "2" → "02"). */
  def zfill(df: DataFrame, cols: Map[String, Int]): DataFrame =
    cols.filter { case (c, _) => df.columns.contains(c) }
      .foldLeft(df) { case (d, (c, n)) =>
        d.withColumn(c, lpad(col(c).cast("string"), n, "0"))
      }

  /** Provenance columns (reference appends source_file / dataset). */
  def lineage(df: DataFrame, sourceFile: String, dataset: String): DataFrame =
    df.withColumn("source_file", lit(sourceFile))
      .withColumn("dataset", lit(dataset))

  /** Case-insensitive multi-candidate column resolution — the reference's
    * header-drift tolerance (`load_facts.py:456-478`): return the first
    * present candidate, matching case-insensitively. */
  def resolveColumn(df: DataFrame, candidates: Seq[String]): Option[String] = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    candidates.view.map(_.toLowerCase).flatMap(byLower.get).headOption
  }

  /** Full prep chain for one source (the reference's `prepare_tables` per
    * TableSpec): normalize → rename → coerce → pad → geo-enrich → dedup →
    * lineage → extra transform. */
  def prepare(df: DataFrame, spec: TableSpec, sourceFile: String): DataFrame = {
    var d = normalizeHeaders(df, spec.renameMap)
    d = coerceNumeric(d, spec.numericCols)
    d = coerceNumeric(d, spec.intCols, "int")
    d = zfill(d, spec.padCols)
    spec.geoCol.foreach(g => d = enrichGeo(d, g))
    d = spec.dedupSubset match {
      case Some(cols) => d.dropDuplicates(cols)
      case None       => d.distinct()
    }
    d = lineage(d, sourceFile, spec.name)
    spec.extraTransform.map(_(d)).getOrElse(d)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest layer (SURVEY §2.1 S1-S11): CSV, nested JSON (communes-shaped),
  * and a pluggable driver-side fetch source for REST/scrape feeds.
  *
  * Scale posture: file sources are plain `spark.read` (splittable,
  * predicate/projection pushdown applies); the API source materializes the
  * fetched payload through `spark.createDataset` so everything downstream
  * is a normal distributed DataFrame.
  */
object Sources {

  /** S1/S2: CSV scan with explicit schema (DDL-first like the reference) or
    * header inference when schema is None. */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      delimiter: String = ","): DataFrame = {
    val r = spark.read.option("header", "true").option("delimiter", delimiter)
    schema.map(r.schema).getOrElse(r.option("inferSchema", "true")).csv(path)
  }

  /** S3: multiline JSON document scan (one big document per file). */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S4/S5: driver-side fetch source — the geo-API / scraper pattern
    * (reference `fetch_communes.py`, `scrape_taux.py`): a pluggable
    * `fetch` closure returns raw JSON strings (one per page/region);
    * they are parallelized and parsed into a DataFrame with Spark's JSON
    * inference. No HTTP client is baked in — the caller supplies it. */
  def fetched(spark: SparkSession, pages: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(pages))
  }

  /** Flatten the communes-shaped nested document (reference
    * `fetch_communes.py:157-204`, `data_preparation.ipynb#cell8`):
    * one row per commune with scalar columns, postal-code array joined to
    * a comma string, and the contour kept as a serialized JSON column. */
  def flattenCommunes(communesDoc: DataFrame): DataFrame =
    communesDoc
      .select(explode(col("communes")).as("c"))
      .select(
        col("c.code").as("commune_code"),
        col("c.nom").as("commune_nom"),
        col("c.codeDepartement").as("departement_code"),
        col("c.departement_nom").as("departement_nom"),
        col("c.codeRegion").as("region_code"),
        col("c.region_nom").as("region_nom"),
        col("c.population").cast("int").as("population"),
        col("c.surface").cast("double").as("surface"),
        col("c.longitude").cast("double").as("longitude"),
        col("c.latitude").cast("double").as("latitude"),
        concat_ws(",", col("c.codesPostaux")).as("codes_postaux"),
        to_json(col("c.contour_geojson")).as("contour_geojson"))
      .dropDuplicates("commune_code")

  /** Bridge table: one row per (commune, postal code) — the exploded
    * array (reference `#cell9`). */
  def communePostalBridge(communesDoc: DataFrame): DataFrame =
    communesDoc
      .select(explode(col("communes")).as("c"))
      .select(col("c.code").as("commune_code"),
        explode(col("c.codesPostaux")).as("code_postal"))
      .distinct()

  /** S7/S9/S11 sinks: parquet/json/csv/orc writers with mode control. */
  def writeParquet(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)
  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator demonstrations; each has a
  * matching DuckDB oracle in `oracleSql` unless it is not SQL-expressible
  * (driver then records a weaker rows-only check).
  */
object SparkEntry {

  /** All operator demonstrations, grouped by module. */
  def allQs: Seq[Q] =
    Relational.all ++ ExtQueries.all ++ ScdQueries.all ++ MiscQueries.all ++
      AnalyticsQueries.all ++ SeriesQueries.all ++ ScaleQueries.all ++
      MartQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j_star_join")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

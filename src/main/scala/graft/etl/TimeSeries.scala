package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators (beyond-reference: the reference's
  * `dim_temps` is a year-grain series with silent gaps — facts simply have
  * no row for a missing year; reference
  * `Terraform/sql/002_create_dimensions.sql:13-27`). A warehouse serving
  * dashboards needs a dense series: every (key, period) cell present,
  * counts zero-filled, slowly-moving values carried forward.
  *
  * Scale shape: the grid is `explode(sequence(min, max))` per key — linear
  * in keys x span, no driver-side loop; the grid join is an equi-join on
  * (key, ordinal) so it co-partitions with the aggregate output; the
  * forward fill is one window pass per key. Two shuffles total at any
  * data size, both on the series key.
  */
object TimeSeries {

  /** Dense (key, ordinal) grid spanning each key's min..max ordinal. */
  def denseGrid(df: DataFrame, key: String, ord: String): DataFrame =
    df.groupBy(key)
      .agg(min(col(ord)).as("__lo"), max(col(ord)).as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), col("__hi"))).as(ord))

  /** Left-join the sparse series onto its dense grid: missing periods
    * appear with null measures (fill with `coalesce` / [[ffill]]). */
  def gapFill(df: DataFrame, key: String, ord: String): DataFrame =
    denseGrid(df, key, ord).join(df, Seq(key, ord), "left")

  /** Forward-fill: latest non-null value at or before the current ordinal
    * (per key). Pair with [[gapFill]] to carry values across gaps. */
  def ffill(c: Column, key: String, ord: String): Column =
    last(c, ignoreNulls = true)
      .over(Window.partitionBy(key).orderBy(ord))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling pass — the engine-side analogue of the reference's
  * pandas `describe()` / notebook data-quality cells and its
  * `test_dwh.py` integrity probes (null checks, range checks): per-column
  * row/null/distinct counts and numeric ranges, plus fixed-width
  * histograms for distribution eyeballing.
  *
  * Shapes: [[describe]] runs ONE single-column aggregate job per
  * profiled column — several exact distincts in a single multi-agg make
  * Catalyst plan an Expand (cols× row multiplication over the full row
  * width); per-column jobs keep each pass a column-pruned scan with a
  * plain two-phase distinct, which is both cheaper and exactly the
  * UNION-per-column shape external engines use. Swap in
  * approx_count_distinct when profiling hundreds of columns.
  * [[histogram]] is one groupBy on a computed bucket — the bucket
  * expression is portable arithmetic (no engine-specific width_bucket),
  * so external engines reproduce it bit-for-bit.
  */
object Profile {

  /** Long-format numeric profile: one row per column with count, nulls,
    * exact distincts, min/max/mean. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      val row = df.select(col(c)).agg(
        count(lit(1)), count(when(col(c).isNull, 1)), countDistinct(col(c)),
        min(col(c)).cast("double"), max(col(c)).cast("double"),
        avg(col(c).cast("double"))).first()
      // min/max/mean aggregate to NULL on an empty table or an all-null
      // (or non-numeric-castable) column — exactly what a profiler must
      // report, not crash on
      def opt(i: Int): Option[Double] =
        if (row.isNullAt(i)) None else Some(row.getDouble(i))
      (c, row.getLong(0), row.getLong(1), row.getLong(2),
        opt(3), opt(4), opt(5))
    }.toDF("column", "n", "n_null", "n_distinct", "mn", "mx", "mean")
  }

  /** Fixed-width histogram bucket index in [0, bins-1] over [lo, hi];
    * values at/above hi clamp into the last bucket, below lo into the
    * first. Plain arithmetic — reproducible in any engine. */
  def bucket(c: Column, lo: Double, hi: Double, bins: Int): Column = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    least(lit(bins - 1), greatest(lit(0),
      floor((c.cast("double") - lo) / (hi - lo) * bins).cast("int")))
  }

  /** Histogram counts: (bucket, n) for non-null values of `colName`. */
  def histogram(df: DataFrame, colName: String, lo: Double, hi: Double,
      bins: Int): DataFrame =
    df.filter(col(colName).isNotNull)
      .groupBy(bucket(col(colName), lo, hi, bins).as("bucket"))
      .agg(count(lit(1)).as("n"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling pass — the engine-side analogue of the reference's
  * pandas `describe()` / notebook data-quality cells and its
  * `test_dwh.py` integrity probes (null checks, range checks): per-column
  * row/null/distinct counts and numeric ranges, plus fixed-width
  * histograms for distribution eyeballing.
  *
  * Shapes: [[describe]] is ONE aggregate job over all requested columns
  * (each exact distinct adds an expand branch — fine for the handful of
  * columns a profile run looks at; swap in approx_count_distinct when
  * profiling hundreds). [[histogram]] is one groupBy on a computed bucket
  * — the bucket expression is portable arithmetic (no engine-specific
  * width_bucket), so external engines reproduce it bit-for-bit.
  */
object Profile {

  /** Long-format numeric profile: one row per column with count, nulls,
    * exact distincts, min/max/mean. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"),
        avg(col(c).cast("double")).as(s"${c}__avg"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    cols.zipWithIndex.map { case (c, i) =>
      val b = i * 6
      (c, row.getLong(b), row.getLong(b + 1), row.getLong(b + 2),
        row.getDouble(b + 3), row.getDouble(b + 4), row.getDouble(b + 5))
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

package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order-ish clustered write — the Spark-side replacement for the
  * reference's composite B-tree indexes on `(temps_id, geo_id[,
  * activite_id])` (`Terraform/sql/003_create_facts.sql:39-42` etc., per
  * SURVEY §4): instead of a secondary index, lay the FILES out so that
  * parquet row-group/file min-max stats are tight on EVERY clustered
  * column at once, and predicate pushdown prunes files for queries on
  * any of them (a plain sort is tight on the leading column only).
  *
  * Shape: per-column min/max arrive with ONE tiny aggregate (2·n doubles
  * to the driver), each column linearly bucketizes to 16 bits, buckets
  * bit-interleave into the z-value — all per-row expressions, no UDF.
  * `repartitionByRange` on the z-value (one range shuffle, sampled
  * bounds) + `sortWithinPartitions` gives files that tile the space.
  * Linear bucketization is skew-sensitive in the same way Delta's
  * z-order is; for heavy skew use the equal-frequency variants
  * ([[zValueQuantile]] / `writeClustered(equalFrequency = true)`), which
  * map each column through its own approx-quantile boundaries (one extra
  * aggregate job) so every bucket carries ~the same row count no matter
  * the distribution — same write path after that.
  */
object ZOrder {

  /** 16-bit bucket of `c` within [mn, mx] (degenerate range → bucket 0). */
  private def bucket16(c: Column, mn: Double, mx: Double): Column =
    if (mx == mn) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lit(mn)) / lit(mx - mn) * 65535.0)
        .cast("long")))

  /** Bit-interleaved z-value: bit i of bucket j lands at bit i·n + j.
    * With 4 columns the top interleaved bit is bit 15·4+3 = 63 — the long
    * SIGN bit — so the result is XOR-biased by Long.MinValue to keep
    * signed ordering identical to unsigned z order (otherwise rows with
    * that bit set sort FIRST and one range partition straddles two
    * disjoint z-tiles). The bias is a constant: relative order of any
    * two z-values is unchanged for n < 4 too, so it applies uniformly. */
  private[graft] def interleave(buckets: Seq[Column]): Column = {
    val n = buckets.size
    val terms = for {
      i <- 0 until 16
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    val z = terms.reduce(_.bitwiseOR(_))
    if (n * 16 > 63) z.bitwiseXOR(lit(Long.MinValue)) else z
  }

  /** Z-value column for `cols` against CALLER-SUPPLIED (min, max) bounds
    * per column — pure expression construction, no job. Use this variant
    * when bounds are known (date ranges, key domains) or tracked in a
    * stats table. */
  def zValueWithBounds(cols: Seq[String],
      bounds: Seq[(Double, Double)]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order wants 2-4 columns, got ${cols.size} (1 column = plain sort)")
    require(bounds.size == cols.size, "one (min, max) pair per column")
    interleave(cols.zip(bounds).map { case (c, (mn, mx)) =>
      bucket16(col(c), mn, mx)
    })
  }

  /** Z-value column for `cols`, bucketized against the frame's own
    * min/max — NOTE: runs one small aggregate job (2·n doubles to the
    * driver) to fetch the bounds; pass them to [[zValueWithBounds]]
    * instead when they're already known. */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order wants 2-4 columns, got ${cols.size} (1 column = plain sort)")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).first()
    zValueWithBounds(cols,
      cols.indices.map(i => (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))))
  }

  /** Equal-frequency bucket of `c` against sorted quantile `bounds`:
    * the bucket index is the count of boundaries ≤ the value — a short
    * per-row fold over a literal array (B is small, default 128), no UDF.
    * Duplicate boundaries (a heavy hitter spanning several quantiles)
    * just skip bucket indices, which is harmless to ordering. */
  private def bucketByBounds(c: Column, bounds: Seq[Double]): Column =
    aggregate(array(bounds.map(lit): _*), lit(0L),
      (acc, b) => acc + when(c.cast("double") >= b, 1L).otherwise(0L))

  /** Interior approx-quantile boundaries per column — ONE aggregate job
    * for all columns (B·n doubles to the driver). */
  def quantileBounds(df: DataFrame, cols: Seq[String],
      buckets: Int = 128): Seq[Seq[Double]] = {
    require(buckets >= 2 && buckets <= 65536, "2 <= buckets <= 65536")
    val qs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), qs, lit(10000)))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    cols.indices.map(i => row.getSeq[Double](i).toSeq)
  }

  /** Skew-robust z-value: each column maps through its own equal-
    * frequency (quantile) buckets before interleaving, so a zipfian
    * column still spreads across the full bucket range — linear
    * bucketization would collapse most of its mass into one bucket and
    * z-order degenerates to a sort on the OTHER columns (files then span
    * the skewed column's dense region and min-max pruning dies there).
    * Costs one approx-quantile aggregate over the frame. */
  def zValueQuantile(df: DataFrame, cols: Seq[String],
      buckets: Int = 128): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order wants 2-4 columns, got ${cols.size} (1 column = plain sort)")
    val bounds = quantileBounds(df, cols, buckets)
    interleave(cols.zip(bounds).map { case (c, bs) =>
      bucketByBounds(col(c), bs)
    })
  }

  /** Write `df` as `numFiles` parquet files clustered by the z-order of
    * `cols`: range-partition + in-partition sort on the z-value, so each
    * file covers a compact tile of the `cols` space and min-max pruning
    * works for predicates on any clustered column. Set `equalFrequency`
    * when any clustered column is heavily skewed. */
  def writeClustered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, equalFrequency: Boolean = false): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    val z = if (equalFrequency) zValueQuantile(df, cols) else zValue(df, cols)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

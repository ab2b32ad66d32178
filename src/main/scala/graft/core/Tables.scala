package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table access for the driver's TPC-H-ish star schema
  * (`/root/repo/TESTDATA.md`). One parquet file per table under a
  * scale-factor directory.
  *
  * At cluster scale these would be catalog tables partitioned by a
  * date/year column; reading a directory of parquet keeps the same
  * DataFrame-first shape (columnar scan, predicate pushdown, column
  * pruning all apply identically).
  */
object Tables {

  /** Spread a DataFrame across the session's parallelism before CPU-heavy
    * per-row compute. Small local files arrive as ONE partition (splits
    * are byte-based, `spark.sql.files.maxPartitionBytes`), which serializes
    * expensive expressions; at warehouse scale inputs already have many
    * splits and this becomes a no-op-sized round-robin shuffle. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd reads the physical plan's partition count without df.rdd's
    // extra DeserializeToObject conversion (row encoders never engage)
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** [[spread]] for frames that sit on a JOIN/AGGREGATE tail, where the
    * partition-count probe would be disastrous: `toRdd` on an adaptive
    * plan materializes every upstream exchange to pick the final plan, so
    * probing a lazy join tail executes the whole upstream once at plan-
    * build time (and the repartitioned query then re-runs it). This
    * variant gates on the OPTIMIZER'S size estimate instead — no jobs,
    * no execution: a frame estimated under parallelism × the AQE
    * advisory partition size is cheap to round-robin (tiny shuffle,
    * big parallelism win for CPU-heavy per-row work downstream — AQE
    * coalesces small shuffle tails to byte-sized partition counts that
    * serialize expensive expressions); anything estimated larger
    * already has enough splits and passes through untouched, so the
    * 100 TB path never pays a probe or an extra exchange. */
  def spreadIfSmall(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    val advisory = sess.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(advisory) * target) df.repartition(target) else df
  }
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The testdata layout convention — every consumer of `$dir/$name`
    * paths (including size-gated plan choices) must derive them here. */
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The testdata's `events.ts` parquet annotation has changed across
    * generator versions — TIMESTAMP(NANOS, adjustedToUTC) in some, plain
    * TIMESTAMP(MICROS) without UTC adjustment (→ TIMESTAMP_NTZ) in others.
    * The engine's contract is a session-zoned TimestampType: every
    * downstream consumer (numeric casts, `withWatermark`, window functions)
    * assumes it. Normalize all three arrival shapes here so no query or
    * operator has to care:
    *   - TIMESTAMP(NANOS) + `spark.sql.legacy.parquet.nanosAsLong=true`
    *     arrives as nanos-since-epoch LongType; integer-divide to micros
    *     (double division would lose precision at 1e18 magnitudes).
    *   - TIMESTAMP_NTZ: cast to TimestampType. The session is pinned UTC
    *     (GraftSession), as is the DuckDB oracle, so the wall-clock values
    *     are identical and result hashes are unaffected.
    *   - TimestampType: already the contract, pass through. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    case _ => df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

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
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
    // (microsecond) cannot represent. With
    // spark.sql.legacy.parquet.nanosAsLong=true the column arrives as
    // nanos-since-epoch LongType; convert with integer division (a double
    // division would lose precision at 1e18 magnitudes).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

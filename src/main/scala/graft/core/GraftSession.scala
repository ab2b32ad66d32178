package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Mirrors the posture the reference gets from SQL Server's optimizer +
  * columnstore (reference `Terraform/sql/007_configure_performance.sql:8-64`):
  * on Spark that is AQE (runtime re-plan, skew-join splitting, partition
  * coalescing) + parquet vectorized reads. Shuffle partitions default to the
  * local core count; on a real cluster this is overridden to ~2-3x total
  * executor cores (and AQE coalesces down from there).
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      // engine extensions: RLS injection (inert until configured), custom
      // functions, bounded-heap top-k-per-key strategy
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
}

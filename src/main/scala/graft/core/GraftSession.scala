package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Mirrors the posture the reference gets from SQL Server's optimizer +
  * columnstore (reference `Terraform/sql/007_configure_performance.sql:8-64`):
  * on Spark that is AQE (runtime re-plan, skew-join splitting, partition
  * coalescing) + parquet vectorized reads.
  *
  * Shuffle partitions follow the standard 2-3x-total-cores sizing rule
  * (we apply 3x): per-task state in wide aggregates shrinks with the
  * partition count, and the equal-cpu TailProfile runs (docs/SCALING.md
  * "superlinear tail") measured the 1x-cores default spilling 6.3 GB
  * (`j_cooccurrence` basket collect_set) and 14.9 GB (`x_pagerank`
  * contribution agg) at sf10 — state that fits in memory at 3x. The
  * over-partitioning cost at small scale is absorbed by AQE partition
  * coalescing, which merges post-shuffle partitions back to the data's
  * actual size, so small-SF plans pay scheduler overhead only until the
  * first exchange. On a real cluster the same rule scales to ~2-3x total
  * executor cores (8-12k at the 1000-executor target).
  */
object GraftSession {
  /** The 2-3x-cores shuffle-partition rule (3x applied). */
  def shufflePartitionsFor(cores: Int): Int = cores * 3

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  /** `cores` is the executor thread count; shuffle partitions derive
    * from it via [[shufflePartitionsFor]]. */
  def builder(master: String, cores: Int): SparkSession.Builder =
    builderWithPartitions(master, shufflePartitionsFor(cores))

  def builderWithPartitions(master: String, shufflePartitions: Int): SparkSession.Builder =
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

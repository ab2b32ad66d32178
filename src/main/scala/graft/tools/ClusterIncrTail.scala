package graft.tools

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev tool: time the INCREMENTAL TAIL of near-dup cluster maintenance
  * separately from the from-scratch prior build.
  *
  * The `x_dedup_clusters_incr` gate deliberately rebuilds the prior
  * clustering from scratch every run — the DuckDB oracle knows nothing
  * about the old/new split, so a green row proves incremental ≡ batch.
  * That makes the GATE's wall-clock ≈ (prior build) + (incremental
  * tail), while a deployment pays only the tail per ingest batch (its
  * prior state is a stored table). This probe materializes the prior
  * state eagerly (old-side signature index + converged clustering,
  * localCheckpoint + count), then times ONLY what a deployment pays:
  * batch signature pass + new×old and new×new pairs + contracted
  * incremental clustering + the size-histogram aggregate. Min-of-N
  * wall, Bench's pinned calibration probe printed alongside.
  *
  * Usage: ClusterIncrTail <sfDir> [runs]   (SPARK_GRAFT_CPUS honored)
  */
object ClusterIncrTail {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def calibrate(): Double = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val t0 = System.nanoTime()
        spark.range(0, 50000000L, 1, 8)
          .select(xxhash64(col("id")).as("h"))
          .groupBy(pmod(col("h"), lit(64)))
          .agg(count(lit(1)), bit_xor(col("h")))
          .collect()
        (System.nanoTime() - t0) / 1e9
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    val all = graft.core.Tables.load(spark, sfDir, "documents")
    val isNew = col("doc_id") % 7 === 0
    val nw = all.filter(isNew).localCheckpoint()

    // ---- prior state: built once, materialized, NOT timed ----
    val t0 = System.nanoTime()
    val oldIdx = Dedup.signatureIndex(all.filter(!isNew), "text", "doc_id")
      .localCheckpoint()
    val existing = all.filter(!isNew).select(col("doc_id").as("id"))
      .join(Dedup.clusterPairs(Dedup.nearDupPairsFromIndex(oldIdx, "doc_id")
        .filter(col("jaccard") >= 0.8)), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .localCheckpoint()
    val priorSec = (System.nanoTime() - t0) / 1e9

    // ---- incremental tail: what a deployment pays per ingest batch ----
    def tail(): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t = System.nanoTime()
      val newIdx = Dedup.signatureIndex(nw, "text", "doc_id")
        .localCheckpoint()
      val crossPairs = Dedup
        .incrementalNearDupPairsFromIndex(newIdx, oldIdx, "doc_id")
        .filter(col("jaccard") >= 0.8)
        .select(col("new_id").as("a_id"), col("old_id").as("b_id"))
      val newNewPairs = Dedup.nearDupPairsFromIndex(newIdx, "doc_id")
        .filter(col("jaccard") >= 0.8).select("a_id", "b_id")
      Dedup.clusterPairsIncremental(existing,
          nw.select(col("doc_id").as("id")),
          crossPairs.unionByName(newNewPairs))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n"), max("id").as("mx"))
        .groupBy(col("n").as("n_docs"))
        .agg(count(lit(1)).as("n_clusters"), sum("cluster_id"), sum("mx"))
        .collect()
      (System.nanoTime() - t) / 1e9
    }
    tail() // warmup (codegen + JIT on the real plans)
    val tails = (1 to runs).map(_ => tail())
    val cal = (1 to 3).map(_ => calibrate()).min
    println(f"""{"prior_build_sec":$priorSec%.2f,""" +
      f""""incr_tail_sec":${tails.min}%.2f,""" +
      f""""tail_runs":[${tails.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""host_calibration_sec":$cal%.3f,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}

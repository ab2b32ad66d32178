package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: attribute the near-dup clustering decade ratio. For each SF
  * dir: build the LSH candidate pairs once (checkpointed, excluded from
  * the clustering timings), then time min-label propagation
  * (Dedup.clusterPairs) and large-star/small-star contraction
  * (Dedup.clusterPairsStar) with their executed round counts and shuffle
  * bytes — separating "rounds grew with corpus" from "per-round cost
  * grew" (docs/SCALING.md §tail).
  *
  * Usage: ClusterProfile <sfDir> [<sfDir> ...]
  */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"dir"}%-28s ${"algo"}%-12s ${"pairs"}%9s ${"rounds"}%6s ${"wall_s"}%8s ${"shufW_MB"}%9s")
    args.foreach { dir =>
      val docs = graft.core.Tables.load(spark, dir, "documents")
      val pairs = graft.ext.Dedup.nearDupPairs(docs, "text", "doc_id")
        .filter(col("jaccard") >= 0.8).localCheckpoint()
      val nPairs = pairs.count()
      Seq(
        "propagation" -> (() => graft.ext.Dedup.clusterPairs(pairs)),
        "star" -> (() => graft.ext.Dedup.clusterPairsStar(pairs))
      ).foreach { case (name, run) =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val (_, m) = graft.ops.QueryMetrics.measure(spark) {
          run().groupBy("cluster_id")
            .agg(count(lit(1)).as("n_docs"), max("id").as("max_doc"))
            .count()
        }
        val w = (System.nanoTime() - t0) / 1e9
        println(f"$dir%-28s $name%-12s $nPairs%9d " +
          f"${graft.ext.Dedup.lastRounds}%6d $w%8.2f " +
          f"${m.shuffleWriteBytes / 1e6}%9.1f")
      }
    }
    spark.stop()
  }
}

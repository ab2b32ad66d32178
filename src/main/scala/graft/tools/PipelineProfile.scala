package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (r18): attribute x_pipeline_e2e's wall time stage by stage
  * (guide §1.4/§1.5 — noop-sink timing with labelled jobs). Stages mirror
  * the declared query exactly; each is materialized behind the previous
  * stage's checkpoint so the timings are additive, not cumulative.
  *
  *   tools/run.sh graft.tools.PipelineProfile /root/testdata/sf0.1
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Curation, Dedup}
    def timed[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[pipeprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val all = graft.core.Tables.load(spark, d, "documents")
        .select("doc_id", "text", "lang")
      val benchmark = all.filter(col("doc_id") % 17 === 0)
      val corpus = graft.core.Tables.spread(
        all.filter(col("doc_id") % 17 =!= 0))
      val kept0 = Curation.qualityFilter(corpus, "text")
        .filter(col(Curation.KeepCol))
        .select("doc_id", "text", "lang")
      val kept = timed("quality filter")(kept0.localCheckpoint())
      val pairs0 = Dedup.nearDupPairs(kept, "text", "doc_id")
        .filter(col("jaccard") >= 0.8)
      val pairs = timed("nearDupPairs")(pairs0.localCheckpoint())
      val clusters = timed("clusterPairs")(
        Dedup.clusterPairs(pairs).localCheckpoint())
      val deduped0 = kept.join(
        clusters.filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      val deduped = timed("dedup anti-join")(deduped0.localCheckpoint())
      val contaminated0 = Curation.contamination(
          deduped, "text", "doc_id", benchmark, "text")
        .filter(col("contamination") > 0.5).select("doc_id")
      // r19 sub-attribution: the benchmark broadcast-side build vs the
      // corpus probe side
      timed("  benchShingles distinct (noop)") {
        graft.core.Tables.spread(benchmark)
          .select(explode(Dedup.shingles(col("text"), 3)).as("__bs"))
          .distinct()
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[pipeprof]   deduped partitions = " +
        deduped.rdd.getNumPartitions)
      timed("  corpus explode+agg, no bench join (noop)") {
        deduped
          .select(col("doc_id"),
            explode_outer(array_distinct(Dedup.shingles(col("text"), 3)))
              .as("__s"))
          .groupBy("doc_id")
          .agg(count(col("__s")).as("n_shingles"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("  corpus explode+agg, re-spread (noop)") {
        deduped.repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            explode_outer(array_distinct(Dedup.shingles(col("text"), 3)))
              .as("__s"))
          .groupBy("doc_id")
          .agg(count(col("__s")).as("n_shingles"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("  corpus n_shingles as pure projection (noop)") {
        deduped
          .select(col("doc_id"),
            size(array_distinct(Dedup.shingles(col("text"), 3)))
              .as("n_shingles"))
          .write.format("noop").mode("overwrite").save()
      }
      val contaminated = timed("contamination")(contaminated0.localCheckpoint())
      val clean0 = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      val clean = timed("clean anti-join")(clean0.localCheckpoint())
      val split0 = Curation.leakSafeSplitClustered(clean, "doc_id", clusters)
        .select(col("doc_id"), col("split"))
      val split = timed("leakSafeSplitClustered")(split0.localCheckpoint())
      val chunks0 = Curation.chunk(clean.join(split, "doc_id"), "text",
        chunkTokens = 32, overlap = 8)
      val keyed0 = chunks0.withColumn("__key", Curation.shuffleKey(
        concat(col("doc_id").cast("string"), lit("_"),
          col("chunk_idx").cast("string")), "ep1"))
        .select("doc_id", "chunk_idx", "lang", "split", "n_chunk_tokens",
          "__key")
      val keyed = timed("chunk + shuffle key")(keyed0.localCheckpoint())
      timed("packShards + orderBy") {
        Curation.packShards(keyed, "n_chunk_tokens", "__key",
            budget = 1000L, partitionCols = Seq("split", "lang"))
          .select(col("doc_id"), col("chunk_idx"), col("lang"), col("split"),
            col("n_chunk_tokens"), col("shard_id"))
          .orderBy("doc_id", "chunk_idx")
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}

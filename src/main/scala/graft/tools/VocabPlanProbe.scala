package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe for [[graft.ext.Bpe.encodeIds]]'s vocabulary lookup at
  * production vocab sizes (docs/SCALING.md): for each size, runs the
  * same encode twice — `element_at` over the `typedlit` map literal
  * (Spark's builtin probes `ArrayBasedMapData` with a LINEAR key scan)
  * vs the hash-indexed [[graft.functions.VocabLookupAll]] expression —
  * printing analysis time, first-action wall time (codegen + task
  * binary broadcast included), steady-state second action, and the
  * literal's in-plan footprint. Both paths must agree on the result.
  *
  *   tools/run.sh graft.tools.VocabPlanProbe <sfDir> <size1,size2,...>
  */
object VocabPlanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val sizes = args.lift(1).getOrElse("32,1024,16384,50000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, d, "documents")
      .select("doc_id", "text")
    val merges = graft.ext.Bpe.train(docs, "text", 8)
    val real = graft.ext.Bpe.tokenVocab(docs, "text", merges)
    sizes.foreach { n =>
      // synthetic vocab of n entries with realistic subword strings;
      // the REAL 8-merge vocab is placed first so lookups still hit
      val pad = (real.size until n).map(i => (i.toLong, s"tok_$i"))
      val vocab = real ++ pad
      val vlit = typedlit(vocab.map { case (id, t) => (t, id) }.toMap)
      val linear = graft.ext.Bpe.encode(docs, "text", merges)
        .withColumn("bpe_ids",
          transform(col("bpe_tokens"), t => element_at(vlit, t)))
      val hashed = graft.ext.Bpe.encodeIds(docs, "text", merges, vocab)
      var results = Map.empty[String, Long]
      Seq("element_at" -> linear, "hash_expr" -> hashed).foreach {
        case (mode, df) =>
          val t0 = System.nanoTime()
          val agg = df.select(
            sum(size(filter(col("bpe_ids"), x => x.isNotNull))).as("n"))
          agg.queryExecution.executedPlan // force analysis+planning
          val tPlan = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val r1 = agg.head().getLong(0)
          val tFirst = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val r2 = agg.head().getLong(0)
          val tSecond = (System.nanoTime() - t2) / 1e9
          require(r1 == r2)
          results += mode -> r1
          val litBytes = vocab.map { case (_, t) => t.length + 8 }.sum
          println(f"""{"mode":"$mode","vocab":$n,"plan_sec":$tPlan%.2f,"first_sec":$tFirst%.2f,"second_sec":$tSecond%.2f,"lit_bytes":$litBytes,"ids":$r1}""")
      }
      require(results("element_at") == results("hash_expr"),
        s"paths diverged at vocab=$n: $results")
    }
    spark.stop()
  }
}

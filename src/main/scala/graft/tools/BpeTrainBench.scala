package graft.tools

/** Rounds-vs-merges probe for batched BPE training (docs/SCALING.md):
  * trains `numMerges` merges over a data dir's documents at the given
  * batch sizes, printing per-run wall time and the driver-round count
  * (each round = one vocab-grain pair-count job + one bounded fetch) —
  * the product that makes or breaks a 32k–100k production vocab.
  *
  *   tools/run.sh graft.tools.BpeTrainBench <sfDir> <numMerges> <batch1,batch2,...>
  *
  * A batch of `local` runs [[graft.ext.Bpe.trainLocal]] instead (rounds
  * reported as 0: no per-merge Spark jobs at all).
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(512)
    val batches = args.lift(2).getOrElse("1,64")
      .split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, d, "documents")
      .select("doc_id", "text")
    var ref: Option[Seq[graft.ext.Bpe.Merge]] = None
    batches.foreach { b =>
      val t0 = System.nanoTime()
      val (m, rounds) =
        if (b == "local") (graft.ext.Bpe.trainLocal(docs, "text", n), 0)
        else graft.ext.Bpe.trainRounds(docs, "text", n, batchSize = b.toInt)
      val secs = (System.nanoTime() - t0) / 1e9
      ref match {
        case Some(r) => require(m == r, s"batch=$b diverged from batch=${batches.head}")
        case None => ref = Some(m)
      }
      println(f"""{"batch":"$b","merges":${m.size},"rounds":$rounds,"sec":$secs%.1f}""")
    }
    spark.stop()
  }
}

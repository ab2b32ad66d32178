package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the bucketed-ANN scale lever: times
  * `Similarity.knnJoin` at a given signature width (or auto-sized via
  * `knnJoinAuto`) against a scale directory, printing rows + seconds per
  * run. Evidence companion to docs/SCALING.md — the gate query
  * `x_sim_knn_join` pins DEMO geometry (bits=4) for DuckDB oracle
  * parity; this shows the same operator staying linear when bits are
  * sized to the corpus.
  *
  * Usage: AnnBench <sfDir> [bits|auto] [runs]
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bitsArg = args.lift(1).getOrElse("auto")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.core.Tables.load(spark, sfDir, "embeddings")
    val n = corpus.count()
    val bitsUsed = if (bitsArg == "auto")
      graft.ext.Similarity.autoBits(n, 512) else bitsArg.toInt
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val rows = graft.ext.Similarity.knnJoin(corpus, "embedding", "vec_id",
        k = 3, bits = bitsUsed, dim = 64).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = graft.ext.Similarity.nearDupEmbeddings(corpus, "embedding",
        "vec_id", threshold = 0.4, bits = bitsUsed, dim = 64).count()
      val sec2 = (System.nanoTime() - t1) / 1e9
      println(f"[annbench] run $i: n=$n bits=$bitsUsed knn_rows=$rows " +
        f"$sec%.2fs neardup_pairs=$pairs $sec2%.2fs")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe for [[graft.ext.Bpe.encode]]'s merge application at
  * production merge counts (docs/SCALING.md): for each merge count,
  * trains that many merges locally (trainLocal — driver-side loop, so
  * the probe measures ENCODE, not training), then runs the same encode
  * twice per variant — the r13 `aggregate`-HOF fold (interpreted,
  * O(numMerges × wordLen) per word) vs the native
  * [[graft.functions.BpeEncodeText]] expression (codegen,
  * O(appliedMerges × wordLen)) — printing first-action and
  * steady-state wall times. Both paths must agree on token count and
  * a content checksum.
  *
  *   tools/run.sh graft.tools.BpeEncodeProbe <sfDir> <merges1,merges2,...>
  */
object BpeEncodeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sizes = args.lift(1).getOrElse("8,128,512,2048,8192")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, d, "documents")
      .select("doc_id", "text").localCheckpoint() // scan off the clock
    sizes.foreach { n =>
      val merges = graft.ext.Bpe.trainLocal(docs, "text", n)
      val variants = Seq(
        "hof_fold" -> graft.ext.Bpe.encodeFold(docs, "text", merges),
        "native" -> graft.ext.Bpe.encode(docs, "text", merges))
      var sums = Map.empty[String, (Long, Long)]
      val times = variants.map { case (name, enc) =>
        val q = enc.agg(
          sum("n_bpe_tokens").cast("long"),
          sum(crc32(array_join(col("bpe_tokens"), " "))).cast("long"))
        def one(): Long = {
          val t0 = System.nanoTime()
          val r = q.head()
          val ms = (System.nanoTime() - t0) / 1000000
          sums += name -> (r.getLong(0), r.getLong(1))
          ms
        }
        val first = one()
        val steady = one()
        (name, first, steady)
      }
      require(sums("hof_fold") == sums("native"),
        s"fold and native disagree at $n merges: $sums")
      val t = times.map { case (nm, f, s) => s"$nm first=${f}ms steady=${s}ms" }
        .mkString("  ")
      println(s"merges=${merges.size} (asked $n)  $t  " +
        s"tokens=${sums("native")._1}")
    }
    spark.stop()
  }
}

package graft

/** Dev tool: attribute scaling behavior per query. Runs each named query
  * at two SF dirs under QueryMetrics and prints wall-clock, shuffle
  * bytes, records read and their large/small ratios — separating
  * "candidate volume grew" (records/shuffle ratio tracks the wall ratio)
  * from "plan regressed" (wall ratio far above the data ratios).
  *
  * Usage: TailProfile <smallDir> <largeDir> <q1,q2,...> [runs]
  */
object TailProfile {
  def main(args: Array[String]): Unit = {
    val small = args(0)
    val large = args(1)
    val names = args(2).split(',').toSeq
    val runs = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def measure(name: String, dir: String): (Double, graft.ops.QueryMetrics.Snapshot) = {
      // min-of-N wall with the metrics of the fastest run
      var best: (Double, graft.ops.QueryMetrics.Snapshot) = null
      for (_ <- 1 to runs) {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val (_, m) = graft.ops.QueryMetrics.measure(spark) {
          SparkEntry.queries(name)(spark, dir).count()
        }
        val w = (System.nanoTime() - t0) / 1e9
        if (best == null || w < best._1) best = (w, m)
      }
      best
    }
    println(f"${"query"}%-22s ${"wall_s"}%8s ${"wall_L"}%8s ${"xWall"}%6s ${"xShufW"}%7s ${"xRecs"}%6s  shufW_L recs_L")
    names.foreach { n =>
      val (ws, ms) = measure(n, small)
      val (wl, ml) = measure(n, large)
      def ratio(a: Long, b: Long) = if (b == 0) Double.NaN else a.toDouble / b
      println(f"$n%-22s $ws%8.2f $wl%8.2f ${wl / ws}%6.2f " +
        f"${ratio(ml.shuffleWriteBytes, ms.shuffleWriteBytes)}%7.2f " +
        f"${ratio(ml.recordsRead, ms.recordsRead)}%6.2f  " +
        f"${ml.shuffleWriteBytes / 1e6}%.1fMB ${ml.recordsRead / 1e6}%.1fM " +
        f"spill=${ml.spillBytes / 1e6}%.0fMB")
    }
    spark.stop()
  }
}

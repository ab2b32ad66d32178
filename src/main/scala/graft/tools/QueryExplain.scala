package graft.tools

/** Plan/timing probe for a single declared query: runs it once against a
  * data dir and prints elapsed time plus the executed (post-AQE) physical
  * plan. The per-query A/B companion to `graft.Bench`'s
  * SPARK_GRAFT_BENCH_NAMES isolated mode (docs/SCALING.md protocol).
  *
  *   tools/run.sh graft.tools.QueryExplain <sfDir> <queryName>
  */
object QueryExplain {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val name = args.lift(1).getOrElse("j_star_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, d)
    val t0 = System.nanoTime()
    df.collect()
    println(f"[explain] $name elapsed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}

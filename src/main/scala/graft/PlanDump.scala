package graft

/** Dev tool: print the formatted physical plan of named queries (all
  * queries when no args) at sf0.001 — the feedback loop behind
  * `docs/PLANS.md`. Usage: `tools/run.sh graft.PlanDump x_shard_pack ...` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}

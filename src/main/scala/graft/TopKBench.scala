package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Micro-benchmark for the TopKPerKey strategy: the same row_number top-k
  * query with the rewrite on vs off (Spark's sort-based window +
  * WindowGroupLimit path), min-of-3 per side. Usage:
  * `tools/run.sh graft.TopKBench [sfDir] [k]`. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // lineitem top-k per (returnflag, linestatus): few heavy keys — the
    // shape where the sort-based path pays n·log n per map partition and
    // the heap pays n·log k
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")

    def run(): Long = {
      val w = Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).count()
    }
    def timed(): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    def best(flag: Boolean): Double = {
      spark.conf.set("spark.graft.topkRewrite.enabled", flag.toString)
      (1 to 3).map(_ => timed()).min
    }
    val on = best(true)
    val off = best(false)
    println(f"""{"query":"topk_per_key","k":$k,"rows":${li.count()},"rewrite_on_sec":$on%.3f,"rewrite_off_sec":$off%.3f,"speedup":${off / on}%.2f}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (r18): attribute x_pagerank's wall time — basket-pair edge
  * expansion, edge+degree table materialization, then the 5-iteration
  * rank loop — and print the edge-prep executed plan (Exchange count is
  * the thing under test; the iteration plan is lazy-checkpointed and
  * invisible to explain).
  *
  *   tools/run.sh graft.tools.PageRankProfile /root/testdata/sf0.1
  */
object PageRankProfile {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val sets = graft.core.Tables.load(spark, d, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val edges = sets.select(explode(flatten(
        transform(col("ps"), a =>
          transform(filter(col("ps"), b => b =!= a),
            b => struct(a.as("src"), b.as("dst")))))).as("p"))
        .select(col("p.src"), col("p.dst"))
      timed("edge expansion (count)") {
        edges.write.format("noop").mode("overwrite").save()
      }
      // mirror Graph.pageRank's edge prep
      val e = edges.select(col("src").as("__src"), col("dst").as("__dst"))
        .distinct()
      val deg = e.groupBy("__src")
        .agg(count(lit(1)).cast("double").as("__outdeg"))
      val withDeg = e.join(deg, "__src")
        .repartition(col("__src"))
        .sortWithinPartitions("__src")
      timed("edge prep (noop)") {
        withDeg.write.format("noop").mode("overwrite").save()
      }
      if (pass == 2) {
        val qe = withDeg.queryExecution
        qe.executedPlan // force
        println(qe.executedPlan.toString.take(6000))
      }
      // r19: attribute INSIDE pageRank — the r18 window edge prep,
      // node/dangling materialization, then the iteration cascade
      {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("__src")
        val withDeg = edges
          .select(col("src").as("__src"), col("dst").as("__dst"))
          .repartition(col("__src"))
          .distinct()
          .withColumn("__outdeg", count(lit(1)).over(w).cast("double"))
          .sortWithinPartitions("__src")
          .persist()
        timed("  withDeg (window prep, noop)") {
          withDeg.write.format("noop").mode("overwrite").save()
        }
        val nodes = withDeg.select(col("__src").as("node"))
          .union(withDeg.select(col("__dst").as("node"))).distinct().persist()
        timed("  nodes (noop)") {
          nodes.write.format("noop").mode("overwrite").save()
        }
        val dangling = nodes.join(
          withDeg.select(col("__src").as("node")).distinct(),
          Seq("node"), "left_anti").persist()
        timed("  dangling isEmpty") { dangling.isEmpty }
        withDeg.unpersist(); nodes.unpersist(); dangling.unpersist()
      }
      val ranks = timed("pageRank 5 iters (full)") {
        val r = graft.ext.Graph.pageRank(edges, "src", "dst", iters = 5)
        r.count(); r
      }
      timed("final projection") {
        val n = broadcast(ranks.agg(count(lit(1)).cast("double").as("__n")))
        ranks.crossJoin(n)
          .select(col("node").as("part_key"),
            graft.queries.Fp.r(col("pr") * col("__n"), 4).as("pr_scaled"))
          .orderBy(col("pr_scaled").desc, col("part_key"))
          .limit(20).collect()
      }
    }
    spark.stop()
  }
}

package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a set of declared queries to files —
  * the r18 optimization round's plan-evidence capture
  * (plans/r18/<query>_<tag>.txt; judge checks plan claims against these).
  *
  *   tools/run.sh graft.tools.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val outDir = Paths.get(args(1))
    val tag = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$tag.txt"), plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}

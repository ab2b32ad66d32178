package graft.etl

import org.apache.spark.sql.SparkSession
import graft.ops.EtlLog

/** Pipeline orchestration — the Spark re-expression of the reference's
  * `analytics/etl/run_etl.py` runner: sequential stages inside ONE
  * SparkSession (the reference's subprocess + JSON-report IPC collapses
  * into function calls), per-stage try/catch with an execution report,
  * and failure cascade: when a stage a later stage depends on fails, the
  * dependents are recorded IGNORE and skipped
  * (reference `--staging-failed` cascade, `run_etl.py:726-734`).
  */
object EtlRunner {

  final case class Stage(
      name: String,
      dependsOn: Seq[String] = Nil,
      body: () => Long) // returns rows processed

  final case class StageReport(
      name: String, status: String, rows: Long, seconds: Double,
      message: String)

  /** Run stages in order; log each to the ops log table; cascade skips. */
  def run(spark: SparkSession, logPath: String, stages: Seq[Stage]): Seq[StageReport] = {
    val failed = scala.collection.mutable.Set[String]()
    stages.map { st =>
      if (st.dependsOn.exists(failed.contains)) {
        failed += st.name // transitively cascade
        val r = StageReport(st.name, "IGNORE", 0L, 0.0,
          s"skipped: upstream failed (${st.dependsOn.filter(failed.contains).mkString(",")})")
        EtlLog.append(EtlLog.entry(spark, st.name, st.name, "IGNORE", 0L, 0.0,
          r.message), logPath)
        r
      } else {
        val t0 = System.nanoTime()
        try {
          val rows = st.body()
          val secs = (System.nanoTime() - t0) / 1e9
          EtlLog.append(EtlLog.entry(spark, st.name, st.name, "SUCCES", rows,
            secs), logPath)
          StageReport(st.name, "SUCCES", rows, secs, "")
        } catch {
          case e: Throwable =>
            failed += st.name
            val secs = (System.nanoTime() - t0) / 1e9
            EtlLog.append(EtlLog.entry(spark, st.name, st.name, "ERREUR", 0L,
              secs, String.valueOf(e.getMessage)), logPath)
            StageReport(st.name, "ERREUR", 0L, secs, String.valueOf(e.getMessage))
        }
      }
    }
  }
}

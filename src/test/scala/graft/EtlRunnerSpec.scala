package graft

import org.apache.spark.sql.functions._
import graft.etl.EtlRunner
import graft.etl.EtlRunner.Stage

/** Orchestration semantics: per-stage reports, failure cascade, logging. */
class EtlRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("stages run in order; failures cascade to dependents; all logged") {
    val logPath = java.nio.file.Files.createTempDirectory("graft-run").toString + "/log"
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val reports = EtlRunner.run(spark, logPath, Seq(
      Stage("staging", Nil, () => { ran += "staging"; 100L }),
      Stage("security", Nil, () => { ran += "security"; 10L }),
      Stage("dimensions", Seq("staging"), () =>
        { ran += "dimensions"; throw new RuntimeException("dim boom") }),
      Stage("facts", Seq("staging", "dimensions"), () => { ran += "facts"; 50L }),
      Stage("refresh", Seq("facts"), () => { ran += "refresh"; 1L })))

    assert(ran.toSeq == Seq("staging", "security", "dimensions")) // facts+refresh skipped
    assert(reports.map(r => r.name -> r.status) == Seq(
      "staging" -> "SUCCES", "security" -> "SUCCES", "dimensions" -> "ERREUR",
      "facts" -> "IGNORE", "refresh" -> "IGNORE"))
    assert(reports.find(_.name == "staging").get.rows == 100L)
    assert(reports.find(_.name == "dimensions").get.message == "dim boom")

    val log = spark.read.parquet(logPath)
    assert(log.count() == 5)
    assert(log.filter($"statut" === "IGNORE").count() == 2)
  }

  test("independent stages are unaffected by another branch's failure") {
    val logPath = java.nio.file.Files.createTempDirectory("graft-run2").toString + "/log"
    val reports = EtlRunner.run(spark, logPath, Seq(
      Stage("a", Nil, () => throw new RuntimeException("x")),
      Stage("b", Nil, () => 1L),
      Stage("c", Seq("b"), () => 2L)))
    assert(reports.map(r => r.name -> r.status) == Seq(
      "a" -> "ERREUR", "b" -> "SUCCES", "c" -> "SUCCES"))
  }
}

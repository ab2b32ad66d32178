package graft

import org.apache.spark.sql.functions._
import graft.etl.{EtlNotifier, EtlRunner}
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

  test("a failure run notifies every sink and persists a report table") {
    val base = java.nio.file.Files.createTempDirectory("graft-run3").toString
    val sent = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val reports = EtlRunner.run(spark, s"$base/log", Seq(
        Stage("staging", Nil, () => 100L),
        Stage("facts", Seq("staging"), () =>
          throw new RuntimeException("fact boom")),
        Stage("refresh", Seq("facts"), () => 1L)),
      sinks = Seq(
        EtlNotifier.transport("nightly", (s, b) => sent += ((s, b))),
        EtlNotifier.table(spark, s"$base/report", "nightly"),
        _ => throw new RuntimeException("sink down"))) // must not fail the run

    assert(reports.map(_.status) == Seq("SUCCES", "ERREUR", "IGNORE"))
    // transport sink: one message, failure outcome + per-stage lines
    assert(sent.size == 1)
    val (subject, body) = sent.head
    assert(subject.contains("ECHEC") && subject.contains("1 ok") &&
      subject.contains("1 en erreur"))
    assert(body.contains("fact boom") && body.contains("staging"))
    // table sink: one row per stage, queryable like the ops log
    val report = spark.read.parquet(s"$base/report")
    assert(report.count() == 3)
    assert(report.filter($"status" === "ERREUR")
      .select("message").as[String].first() == "fact boom")
    assert(report.select("job").distinct().as[String].first() == "nightly")
  }

  test("config resolution: CLI > tfvars > env > defaults") {
    import graft.etl.EtlConfig
    val tf = java.nio.file.Files.createTempFile("graft", ".tfvars")
    java.nio.file.Files.writeString(tf,
      """# comment line
        |warehouse_dir = "/from/tfvars"
        |log_path = "/tfvars/log"
        |
        |not_a_match = unquoted
        |""".stripMargin)
    val resolved = EtlConfig.resolve(
      cli = EtlConfig.parseArgs(Seq("--warehouse_dir", "/from/cli", "--full")),
      tfvarsPath = Some(tf.toString),
      env = Map("log_path" -> "/from/env", "backup_root" -> "/from/env/bak"),
      defaults = Map("backup_root" -> "/default/bak", "retention" -> "30"))
    assert(resolved("warehouse_dir") == "/from/cli") // CLI beats tfvars
    assert(resolved("log_path") == "/tfvars/log") // tfvars beats env
    assert(resolved("backup_root") == "/from/env/bak") // env beats default
    assert(resolved("retention") == "30") // default survives
    assert(resolved("full") == "true") // bare flag
    assert(!resolved.contains("not_a_match")) // reference regex: quoted only
    assert(EtlConfig.parseArgs(Seq("--a=1", "--b", "2")) ==
      Map("a" -> "1", "b" -> "2"))
    assert(EtlConfig.parseTfvars("/nonexistent/path.tfvars").isEmpty)
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

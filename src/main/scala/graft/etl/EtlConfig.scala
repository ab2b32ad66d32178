package graft.etl

/** Runner configuration resolution — the reference's chain of
  * CLI args > `terraform.tfvars` regex parse > environment variables
  * (`analytics/etl/run_etl.py:47-95,304-312`), re-expressed engine-side.
  * The reference resolves SQL-server connection settings; here the same
  * chain resolves whatever the caller's pipeline needs (warehouse dirs,
  * scale factors, sink paths) — resolution is generic string→string,
  * typed accessors sit on the result.
  */
object EtlConfig {

  /** Parse a tfvars-style file: `key = "value"` lines, `#` comments and
    * blank lines skipped — the same line regex the reference uses
    * (`run_etl.py:60`). Tolerates a UTF-8 BOM (the reference opens with
    * `utf-8-sig`). Missing file → empty map, like the reference. */
  def parseTfvars(path: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val line = """^(\w+)\s*=\s*"([^"]*)"\s*$""".r
    scala.util.Using.resource(scala.io.Source.fromFile(p.toFile, "UTF-8")) {
      src =>
        src.getLines()
          .map(_.stripPrefix("﻿").trim)
          .filterNot(l => l.isEmpty || l.startsWith("#"))
          .collect { case line(k, v) => k -> v }
          .toMap
    }
  }

  /** Parse CLI args: `--key value` and `--key=value` both accepted;
    * a trailing flag with no value resolves to "true". */
  def parseArgs(args: Seq[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val body = a.stripPrefix("--")
        val eq = body.indexOf('=')
        if (eq >= 0) out(body.take(eq)) = body.drop(eq + 1)
        else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          out(body) = args(i + 1); i += 1
        } else out(body) = "true"
      }
      i += 1
    }
    out.toMap
  }

  /** Resolve one config map with the reference's precedence:
    * CLI > tfvars file > environment > defaults. */
  def resolve(cli: Map[String, String] = Map.empty,
      tfvarsPath: Option[String] = None,
      env: Map[String, String] = sys.env,
      defaults: Map[String, String] = Map.empty): Map[String, String] =
    defaults ++ env ++ tfvarsPath.map(parseTfvars).getOrElse(Map.empty) ++ cli
}

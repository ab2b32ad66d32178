package graft.tools

import org.apache.spark.sql.SparkSession

/** Provenance gate for the synthetic scale fixtures: re-digests every
  * table of a [[GenScale]]-generated directory and compares against the
  * `DIGESTS.json` the generator recorded — the check a scale sweep runs
  * BEFORE benching, so cross-round absolute timings are only ever
  * compared on verified-identical bytes (regenerating a fixture changes
  * the substrate; r17's sf1/sf10 regeneration made r15 absolutes
  * incomparable with no way to prove it after the fact).
  *
  * Usage: `tools/run.sh graft.tools.VerifyDigests /root/repo/testdata_sf1`
  * Prints one line per table; exits nonzero on any mismatch. */
object VerifyDigests {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: VerifyDigests <scaled-dir>"))
    val recorded = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "DIGESTS.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bad = verify(spark, dir, recorded)
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[digests] MISMATCH: ${bad.mkString(", ")} — " +
        "this directory does NOT hold the bytes the digests were " +
        "recorded for; do not compare benches across the regeneration")
      sys.exit(1)
    }
    println(s"[digests] OK: every table of $dir matches DIGESTS.json")
  }

  /** Names of tables whose recomputed digest line is absent from the
    * recorded JSON (empty = all verified). String containment against
    * the generator's own line format — no JSON parser needed, and a
    * missing table entry fails closed. */
  def verify(spark: SparkSession, dir: String, recorded: String): Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").filterNot { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val r = graft.ops.Quality.tableDigest(df, df.columns.toSeq).head()
      val line =
        s""""$t": {"digest": ${r.getLong(0)}, "n_rows": ${r.getLong(1)}}"""
      val ok = recorded.contains(line)
      println(s"[digests] ${if (ok) "OK  " else "FAIL"} $t " +
        s"digest=${r.getLong(0)} rows=${r.getLong(1)}")
      ok
    }
}

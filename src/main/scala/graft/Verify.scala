package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // lenient: driver may pass extra args or rely on defaults
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/verify")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // oracle_sql.json goes FIRST: if the dump dies mid-way (host OOM /
    // timeout) the driver can still compare every query that finished.
    writeOracles(outDir)
    // 4 concurrent dump jobs (SparkSession is thread-safe; jobs queue
    // FIFO) overlap per-query scheduling/commit gaps — roughly halves the
    // wall time of 59 serial single-partition writes
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // optional 3rd arg: comma-separated query names (local iteration aid;
    // the driver never passes it, so the full dump is the default)
    val only = args.lift(2).map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // a typo'd filter would otherwise dump nothing and check.py would
    // print "0/0 pass" — make the mismatch loud instead of silent
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[verify] unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
      if (selected.isEmpty)
        System.err.println("[verify] filter matched NO queries — nothing will be dumped")
    }
    // A query that throws must NOT silently vanish from the gate (a
    // missing output dir makes the driver's "N/N pass" shrink instead of
    // fail). _declared.json fixes the expected set up front (post-filter,
    // so local `only` runs stay usable; the driver passes no filter →
    // all queries), and every dump failure lands in _failed.json —
    // check.py treats a non-empty manifest, or any declared query with no
    // output, as a hard FAIL.
    Files.writeString(Paths.get(s"$outDir/_declared.json"),
      selected.map(_._1).sorted.map(q).mkString("[", ",", "]"))
    val failed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    // coalesce(1) keeps the driver's small-SF dumps single-file, but a
    // 60M-row sf10 result through ONE write task OOMs the driver heap —
    // SPARK_GRAFT_DUMP_COALESCE=0 keeps the natural partitioning for
    // large-SF sweeps (check.py reads directory globs either way)
    val doCoalesce = sys.env.getOrElse("SPARK_GRAFT_DUMP_COALESCE", "1") != "0"
    val jobs = selected.map { case (name, fn) =>
      scala.concurrent.Future {
        try {
          val res = fn(spark, sfDir)
          (if (doCoalesce) res.coalesce(1) else res).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed.put(name, Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(jobs),
      scala.concurrent.duration.Duration.Inf)
    import scala.jdk.CollectionConverters._
    writeJsonMap(s"$outDir/_failed.json", failed.asScala.toMap)
    pool.shutdown()
    spark.stop()
    // exit 0 even on failures: the driver must still compare the queries
    // that DID dump — the manifest (and check.py) carry the failure signal
    if (!failed.isEmpty)
      System.err.println(s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} FAILED: " +
        failed.keySet.asScala.toSeq.sorted.mkString(", "))
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeJsonMap(path: String, m: Map[String, String]): Unit =
    Files.writeString(Paths.get(path),
      m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))

  private def writeOracles(outDir: String): Unit = {
    writeJsonMap(s"$outDir/oracle_sql.json", SparkEntry.oracleSql)
    // staged large-SF recipes (tools/check.py --scale); see ScaleOracles
    Files.writeString(Paths.get(s"$outDir/oracle_scale.json"),
      ScaleOracles.all.toSeq.sortBy(_._1).map { case (name, steps) =>
        s"${q(name)}: " + steps.map(st =>
          s"""{"per_shard": ${st.perShard}, "sql": ${q(st.sql)}}""")
          .mkString("[", ",", "]")
      }.mkString("{", ",", "}"))
  }
}

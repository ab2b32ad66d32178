package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: put a NUMBER on the single-writer lease's per-micro-batch
  * cost in the streaming sinks.
  *
  * Since r16, `Streams.upsertBatch` / `scd2CdcBatch` hold the swap lease
  * across their whole read→merge→stage→swap section, which adds a fixed
  * set of filesystem round-trips per micro-batch: lease exists-probe +
  * create-exclusive + token write + verify re-read on acquire, the
  * manifest-probe of the recover check, the commit-point ownership
  * re-read, and the token-verified delete on release (plus heartbeat
  * touches, amortized — one per ttl/3, none on short batches). This
  * probe measures that cost two ways:
  *
  *  1. BARE CYCLE: `withSwapLease {}` + `recoverSwapLocked` on an empty
  *     body, min/median over many iterations — the pure FS overhead,
  *     nothing else.
  *  2. IN CONTEXT: per-batch wall of a real `upsertBatch` of `batchRows`
  *     rows into a `tableRows`-row parquet table (the dominant cost is
  *     the merge + rewrite the sink pays with or without the lease).
  *
  * The honest statement of the durability cost is (1) as an absolute
  * and (1)/(2) as a share. Local-FS numbers are a FLOOR for object
  * stores (each round-trip becomes an HTTP call, ~10-50 ms — multiply
  * the op count, not the local latency).
  *
  * Usage: LeaseOverhead [tableRows] [batchRows] [iters]
  */
object LeaseOverhead {
  def main(args: Array[String]): Unit = {
    val tableRows = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val batchRows = args.lift(1).map(_.toLong).getOrElse(10000L)
    val iters = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.hadoop.fs.{Path => HPath}

    val base = java.nio.file.Files.createTempDirectory("graft-lease-oh")
    val dir = base.resolve("kv").toString
    val target = new HPath(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // seed the table (also JIT/codegen warmup for the merge plan)
    spark.range(tableRows)
      .select(col("id").as("k"), lit(0L).as("ver"),
        md5(col("id").cast("string")).as("v"))
      .write.parquet(dir)

    // ---- (1) bare lease cycle: acquire + recover-probe + release ----
    def bareCycle(): Double = {
      val t0 = System.nanoTime()
      graft.ops.Compaction.withSwapLease(fs, target) {
        graft.ops.Compaction.recoverSwapLocked(fs, target)
      }
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 50).foreach(_ => bareCycle()) // warm FS metadata caches
    val bare = (1 to 200).map(_ => bareCycle()).sorted
    val bareMin = bare.head
    val bareMed = bare(bare.size / 2)

    // ---- (2) real upsert batches, lease held as shipped ----
    def batch(i: Int): Double = {
      val b = spark.range(batchRows)
        .select((col("id") * 7 % tableRows).as("k"),
          lit(i.toLong + 1L).as("ver"),
          md5((col("id") + i).cast("string")).as("v"))
      val t0 = System.nanoTime()
      graft.streaming.Streams.upsertBatch(b, dir, Seq("k"), "ver")
      (System.nanoTime() - t0) / 1e9
    }
    batch(0) // warm
    val per = (1 to iters).map(batch)
    val perMin = per.min
    val perMed = per.sorted.apply(per.size / 2)

    println(f"""{"metric":"lease_overhead","bare_cycle_min_sec":$bareMin%.6f,"bare_cycle_median_sec":$bareMed%.6f,"upsert_batch_min_sec":$perMin%.4f,"upsert_batch_median_sec":$perMed%.4f,"overhead_share_of_batch":${bareMed / perMed}%.6f,"table_rows":$tableRows,"batch_rows":$batchRows,"iters":$iters}""")
    spark.stop()
  }
}

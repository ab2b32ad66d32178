package graft

import org.apache.spark.sql.functions._
import graft.etl.ZOrder

/** Z-order clustered write: files must tile the multi-column space so
  * min-max pruning is effective on EVERY clustered column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places each bucket's bits at the right stride") {
    val out = Seq((3L, 1L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
      .as[Long].first()
    // a=0b11 → bits 0,2; b=0b01 → bit 1 ⇒ z = 0b111 = 7
    assert(out == 7L)
  }

  test("z-ordered files tile the 2-D space; a 1-D sort does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString
    // 64x64 uniform grid in a shuffled row order
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
        md5(col("id").cast("string").cast("binary")).as("shuffle"))
      .orderBy("shuffle").drop("shuffle")
    ZOrder.writeClustered(grid, Seq("x", "y"), s"$dir/z", numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/lex")

    def meanFileArea(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(((max("x") - min("x")) * (max("y") - min("y"))).as("area"))
        .select(avg("area")).as[Double].first()
      spans
    }
    val zArea = meanFileArea(s"$dir/z")
    val lexArea = meanFileArea(s"$dir/lex")
    // 16 z-tiles of a 64x64 grid ≈ 16x16 tiles (area ≈ 256); an x-sorted
    // layout leaves y spanning the full 64 per file (area ≈ 4*64 = 256+)...
    // the discriminating fact: z tiles bound BOTH dims, so area is far
    // below the full-grid 64*64, and y-span specifically is bounded
    assert(zArea < 1200, s"z files must tile: mean area $zArea")
    val zYspan = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name()).agg((max("y") - min("y")).as("s"))
      .select(avg("s")).as[Double].first()
    val lexYspan = spark.read.parquet(s"$dir/lex")
      .groupBy(input_file_name()).agg((max("y") - min("y")).as("s"))
      .select(avg("s")).as[Double].first()
    assert(zYspan < lexYspan / 2,
      s"z-order must bound the second dim: $zYspan vs $lexYspan")
    // contents survive the clustering exactly
    val a = spark.read.parquet(s"$dir/z").orderBy("x", "y")
      .as[(Long, Long)].collect().toSeq
    val b = grid.orderBy("x", "y").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("4-column interleave keeps signed order = unsigned z order") {
    // row A: only the 4th column's top bucket bit set → raw z = bit 63
    // (the long sign bit); row B: everything else set → raw z = all lower
    // bits. Unsigned z(A) > z(B), so signed comparison must agree.
    val z = Seq(
      ("A", 0L, 0L, 0L, 32768L), ("B", 65535L, 65535L, 65535L, 0L))
      .toDF("tag", "a", "b", "c", "d")
      .select($"tag", ZOrder.interleave(
        Seq(col("a"), col("b"), col("c"), col("d"))).as("z"))
      .as[(String, Long)].collect().toMap
    assert(z("A") > z("B"),
      s"sign-bit bias must keep A above B: ${z("A")} vs ${z("B")}")
  }

  test("equal-frequency buckets keep pruning alive on a zipfian column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zskew").toString
    // x zipfian (half the rows at x=1, long thin tail to 4096), y uniform
    val skewed = spark.range(4096)
      .select(floor(lit(4096.0) / (col("id") + 1)).as("x"),
        (col("id") % 64).as("y"),
        md5(col("id").cast("string").cast("binary")).as("shuffle"))
      .orderBy("shuffle").drop("shuffle")
    ZOrder.writeClustered(skewed, Seq("x", "y"), s"$dir/linear", numFiles = 16)
    ZOrder.writeClustered(skewed, Seq("x", "y"), s"$dir/quant",
      numFiles = 16, equalFrequency = true)

    // files whose [min_x, max_x] overlaps a probe on the dense region —
    // the proxy for parquet min-max file pruning
    def overlapping(path: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("mn"), max("x").as("mx"))
        .filter($"mn" <= hi && $"mx" >= lo).count()
    // linear bucketization collapses x∈{1..5} (≈90% of rows) into bucket
    // 0, so z degenerates to a y-sort there and nearly every file spans
    // the dense x region; quantile buckets keep the dense region tiled
    val lin = overlapping(s"$dir/linear", 4, 5)
    val qnt = overlapping(s"$dir/quant", 4, 5)
    assert(qnt * 2 <= lin,
      s"quantile mapping must prune the dense region: $qnt vs $lin files")
    // contents survive exactly
    val a = spark.read.parquet(s"$dir/quant").orderBy("x", "y")
      .as[(Long, Long)].collect().toSeq
    val b = skewed.orderBy("x", "y").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("zValue rejects a single column (that's a plain sort)") {
    val ex = intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq((1L, 2L)).toDF("x", "y"), Seq("x"))
    }
    assert(ex.getMessage.contains("2-4"))
  }
}

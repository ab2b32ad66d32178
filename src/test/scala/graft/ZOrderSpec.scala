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

  test("zValue rejects a single column (that's a plain sort)") {
    val ex = intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq((1L, 2L)).toDF("x", "y"), Seq("x"))
    }
    assert(ex.getMessage.contains("2-4"))
  }
}

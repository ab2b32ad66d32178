package graft

import org.apache.spark.sql.functions._

/** Pins the invariants of the synthetic scale-up generator
  * (`tools.GenScale`) that make the sf1 scaling benchmark honest:
  * exact Nx row growth, preserved FK validity and fan-out, and
  * copy-distinct text/embeddings so dedup/ANN workloads scale linearly
  * instead of drowning in artificial cross-copy duplicates. */
class GenScaleSpec extends SparkSpec {

  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("genscale").toString
    graft.tools.GenScale.run(spark, sf001, dir, 3)
    dir
  }

  test("facts grow exactly Nx; dims are byte-identical") {
    Seq("orders", "lineitem", "events", "documents", "embeddings").foreach { t =>
      val base = spark.read.parquet(s"$sf001/$t.parquet").count()
      val scaled = spark.read.parquet(s"$outDir/$t.parquet").count()
      assert(scaled == base * 3, s"$t: $base -> $scaled")
    }
    Seq("region", "nation", "customer").foreach { t =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$sf001/$t.parquet")),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$outDir/$t.parquet"))),
        s"$t dim should be byte-copied")
    }
  }

  test("FK validity and fan-out preserved: every lineitem joins an order") {
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$outDir/orders.parquet")
    val orphans = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
    assert(orphans == 0)
    // fan-out distribution identical to the base (10x orders with the
    // same lines-per-order, not 10x lines on the same orders)
    def fanout(liDf: org.apache.spark.sql.DataFrame) =
      liDf.groupBy("l_orderkey").count()
        .groupBy("count").agg(count(lit(1)).as("n_orders"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = fanout(spark.read.parquet(s"$sf001/lineitem.parquet"))
    val scaled = fanout(li)
    assert(scaled == base.map { case (k, v) => k -> v * 3 })
  }

  test("text stays distinct past 52 copies (affine family, not just rotation)") {
    // regression guard for the measured 100-copy collapse: rotation-only
    // transforms cap at 26 distinct copies on a digit-free corpus, and
    // the pre-r9 family parameters shared the shift across families,
    // agreeing at 'a'/'n' for copies exactly 26k apart. 60 copies spans
    // families 0..2, including an even-distance pair (0,2) whose maps
    // provably agree only on {a, n} — real documents never collide.
    val dir = java.nio.file.Files.createTempDirectory("genscale60").toString
    graft.tools.GenScale.run(spark, sf001, dir, 60)
    val base = spark.read.parquet(s"$sf001/documents.parquet")
      .select("text").distinct().count()
    val scaled = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").distinct().count()
    assert(scaled == base * 60, s"expected ${base * 60} distinct texts, got $scaled")
  }

  test("generation records provenance digests that round-trip") {
    val dig = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/DIGESTS.json")), "UTF-8")
    assert(dig.contains("\"copies\": 3") && dig.contains("\"lineitem\""))
    // the recorded digest matches a fresh re-digest of the same bytes —
    // the check a future round runs before benching this directory
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val r = graft.ops.Quality.tableDigest(docs, docs.columns.toSeq).head()
    assert(dig.contains(
      s""""documents": {"digest": ${r.getLong(0)}, "n_rows": ${r.getLong(1)}}"""),
      s"digest drifted from DIGESTS.json: $dig")
  }

  test("re-scaling an ALREADY-SCALED directory fails loudly: rotation " +
      "ciphers compose, collapsing the copy set (the r17 sf10 trap)") {
    // outDir is 3 copies of sf0.01; 3 copies of THAT compose rotations
    // i+j — only 5 distinct ciphers for 9 nominal copies, exact
    // cross-copy duplicate cliques, quadratic near-dup pair growth
    val dir2 = java.nio.file.Files.createTempDirectory("genscale-compose")
    val e = intercept[IllegalArgumentException] {
      graft.tools.GenScale.run(spark, outDir, dir2.toString, 3)
    }
    assert(e.getMessage.contains("share a cipher"), e.getMessage)
  }

  test("charMap: pairwise agreement is 0 letters (odd family distance / rotations), ≤2 otherwise") {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val maps = (0 until 120).map(graft.tools.GenScale.charMap)
    assert(maps.distinct.size == 120)
    assert(maps(0) == lower + lower.toUpperCase + "0123456789")
    for (i <- 0 until 120; j <- (i + 1) until 120) {
      val agree = (0 until 26).filter(p => maps(i)(p) == maps(j)(p))
        .map(lower(_))
      val famDist = math.abs(i / 26 - j / 26)
      val shiftDist = math.abs(i % 26 - j % 26)
      if (famDist == 0 || (famDist + shiftDist) % 2 == 1)
        // rotations within a family are fully discordant, and so is any
        // pair whose total b-difference (shift + 13·famDist) is odd
        // while a-a' is even: no letter maps alike
        assert(agree.isEmpty, s"copies $i,$j agree at $agree")
      else
        // otherwise gcd(a-a', 26) = 2 → at most two fixed letters
        assert(agree.size <= 2, s"copies $i,$j agree at $agree")
    }
    // the canonical worst pair: same shift, family distance 2 → exactly
    // the x ∈ {0, 13} residue ('a' and 'n')
    val agree52 = (0 until 26).filter(p =>
      graft.tools.GenScale.charMap(0)(p) == graft.tools.GenScale.charMap(52)(p))
      .map(lower(_))
    assert(agree52 == Seq('a', 'n'), agree52.toString)
  }

  test("copies are distinct: no cross-copy duplicate keys, text, or vectors") {
    val ev = spark.read.parquet(s"$outDir/events.parquet")
    assert(ev.select("event_id").distinct().count() == ev.count())
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    // Caesar rotation: distinct text per copy, length preserved
    val baseDocs = spark.read.parquet(s"$sf001/documents.parquet")
    assert(docs.select("text").distinct().count() ==
      baseDocs.select("text").distinct().count() * 3)
    val lenDrift = docs.withColumn("l", length(col("text")))
      .filter(col("l") =!= col("n_chars")).count()
    val baseLenDrift = baseDocs.withColumn("l", length(col("text")))
      .filter(col("l") =!= col("n_chars")).count()
    assert(lenDrift == baseLenDrift * 3, "translate must preserve lengths")
    // embeddings: sign-flip preserves norms, scrambles cross-copy equality
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    assert(emb.select("vec_id").distinct().count() == emb.count())
    val norms = emb.select(round(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("n2"))
      .groupBy("n2").count()
    val baseNorms = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("n2"))
      .groupBy("n2").count()
    val nm = norms.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val bm = baseNorms.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(nm == bm.map { case (k, v) => k -> v * 3 }, "norms must be preserved")
  }
}

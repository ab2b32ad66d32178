package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator: builds an ~Nx copy of a testdata scale
  * factor (default 10x sf0.1 → "sf1") so the bench can record one more
  * scaling decade than the driver ships. Only the four big tables are
  * scaled; dimensions are byte-copied (a warehouse's dims don't grow 10x
  * when its facts do).
  *
  * Scaling must not distort the WORKLOAD SHAPE, so each copy is made
  * distinct rather than duplicated:
  *   - orders/lineitem: order keys shift by the same span per copy, so
  *     FK validity and the orders→lineitem fan-out are preserved exactly
  *     (10x orders with the same lines-per-order, not 10x lines on the
  *     same orders).
  *   - events: event_id AND user_id shift per copy — 10x users with the
  *     same per-user activity, so sessionization / per-key state grows
  *     linearly in keys, not quadratically in per-key events.
  *   - documents: text goes through a per-copy Caesar rotation
  *     (`translate`) — length, token boundaries, and per-copy vocabulary
  *     structure are preserved, but shingles never collide across copies,
  *     so near-dup pair counts scale linearly instead of exploding 100x
  *     on artificial cross-copy near-duplicates.
  *   - embeddings: a deterministic per-copy sign-flip pattern on the
  *     dimensions — WITHIN a copy every vector gets the same pattern, so
  *     dot products and cluster structure are untouched; ACROSS copies
  *     similarity is scrambled, so ANN candidate sets grow linearly.
  *
  * Raw parquet is read/written directly (NOT Tables.load): the scaled set
  * mirrors the driver's annotations byte-for-byte, NTZ timestamps
  * included, so the sf1 bench also exercises the load-shim path at scale.
  * The one exception is a legacy TIMESTAMP(NANOS) events source, whose
  * nanos-as-long reading cannot round-trip the annotation — see the
  * normalization note at the events read.
  */
object GenScale {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  private val Digits = "0123456789"
  private val Coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  val MaxTextCopies: Int = Coprimes.size * 26 // 312

  /** Per-copy character bijection (the `translate` target for source
    * alphabet lower+upper+digits): an AFFINE cipher on letters
    * (x → a·x + b mod 26) plus a digit rotation, case classes preserved
    * (a case-mixing map would collide lowercased shingles across copies
    * and flood the dedup workload with artificial near-dups).
    *
    * Distinctness structure — copy i uses family f = i/26 with
    * a = coprime(f), b = (i + 13·f) mod 26:
    *   - same family, different shift: rotations — discordant at EVERY
    *     letter (no two copies map any letter alike).
    *   - ODD family distance: b differs by 13 (odd) while a−a' is even,
    *     so (a−a')x ≡ (b'−b) mod 26 has no solution — again fully
    *     discordant. (Without the 13·f term, families sharing b agreed
    *     at x ∈ {0, 13} — 'a' and 'n' — so a pathological document over
    *     that 2-letter set could collide across copies > 26.)
    *   - EVEN family distance: b cancels; gcd(a−a', 26) = 2 always
    *     (|a−a'| < 26 even, never a multiple of 13), so the agreement
    *     set is EXACTLY x ∈ {0, 13}. This residue is fundamental: >26
    *     pairwise fully-discordant permutations of a 26-letter alphabet
    *     cannot exist (they would form >26 rows of a 26-column Latin
    *     square), so past 52 copies distinctness is corpus-dependent —
    *     only a digit-free document whose letters all lie in {a, n}
    *     can collide, which GenScaleSpec asserts never happens on the
    *     real corpus at 60 copies.
    *
    * Copy 0 is the identity; copies 0..25 are pure rotations, so smaller
    * scale-ups reproduce byte-identically. Length, case, token
    * boundaries, and per-copy letter-frequency STRUCTURE (a permuted
    * histogram) are preserved. */
  private[graft] def charMap(i: Int): String = {
    def affine(s: String, a: Int, b: Int) =
      (0 until s.length).map(x => s((a * x + b) % s.length)).mkString
    def rotBy(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    val fam = i / 26
    val a = Coprimes(fam % Coprimes.size)
    val b = (i % 26 + 13 * fam) % 26
    affine(Lower, a, b) + affine(Upper, a, b) + rotBy(Digits, fam % 10)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, outDir, copies)
    println(s"[genscale] wrote ${copies}x of $srcDir to $outDir")
    spark.stop()
  }

  /** Post-write fixture-integrity gate: samples base documents and
    * verifies that NO cross-copy pair of their variants reaches
    * near-duplicate shingle Jaccard — the property that keeps the
    * dedup/clustering workload's qualifying-pair count LINEAR in the
    * copy factor (the whole point of the per-copy cipher).
    *
    * This catches, in particular, the CIPHER-COMPOSITION trap: scaling
    * an ALREADY-SCALED directory composes the per-copy maps, and the
    * rotation family composes additively (rot_i ∘ rot_j = rot_{i+j}),
    * so a 10×-of-10× build collapses 100 nominal copies onto only 19
    * distinct ciphers — identical cross-copy texts in cliques of up to
    * 10, whose pairs grow QUADRATICALLY (measured r17: 634× qualifying
    * pairs for 10× docs, 285 jaccard-1.0 cross-copy pairs per base
    * doc). Always scale from the BASE sf directory; this check makes
    * the mistake loud at generation time instead of a bench-ratio
    * mystery three rounds later. */
  def verifyCopyDistinctness(spark: SparkSession, srcDir: String,
      outDir: String, copies: Int, didSpan: Long, sampleBases: Int = 8,
      maxJaccard: Double = 0.5): Unit = {
    if (copies < 2) return
    // GLOBAL exact-distinctness gate — the one that catches the
    // composition trap wherever the colliding pair lands: with `copies`
    // distinct bijections over an all-distinct base corpus, every copy
    // contributes its own distinct texts and none overlap, so any
    // shortfall means two nominal copies share a cipher. (The composed
    // 10×-of-10× build collapses to 19 rotations → distinct ≈ 19/100 of
    // nominal; a per-base-offset check would MISS it because composed
    // duplicates sit at different offsets.)
    val srcDistinct = spark.read.parquet(s"$srcDir/documents.parquet")
      .select("text").distinct().count()
    val outDistinct = spark.read.parquet(s"$outDir/documents.parquet")
      .select("text").distinct().count()
    require(outDistinct == srcDistinct * copies,
      s"verifyCopyDistinctness: expected ${srcDistinct * copies} distinct " +
        s"texts ($copies copies x $srcDistinct), got $outDistinct — two " +
        "copies share a cipher. Was an already-scaled directory " +
        "re-scaled? (rotation ciphers COMPOSE: rot_i of rot_j = " +
        "rot_{i+j}, collapsing the copy set; scale from the base sf dir)")
    val sh = spark.read.parquet(s"$outDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(didSpan)) < sampleBases)
      .select(pmod(col("doc_id"), lit(didSpan)).as("base"),
        (col("doc_id") / lit(didSpan)).cast("int").as("copy"),
        array_distinct(graft.ext.Dedup.shingles(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
    val pairs = sh.alias("a").join(sh.alias("b"),
        col("a.base") === col("b.base") && col("a.copy") < col("b.copy"))
      .select((size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh")))).as("j"))
    val agg = pairs.agg(count(lit(1)).as("n"), max(col("j")).as("worst")).head()
    val (n, worst) = (agg.getLong(0), agg.getDouble(1))
    require(n > 0, "verifyCopyDistinctness: no cross-copy pairs sampled " +
      "(all sampled base docs below one shingle?) — widen sampleBases")
    require(worst < maxJaccard,
      f"verifyCopyDistinctness: cross-copy shingle jaccard $worst%.3f >= " +
        f"$maxJaccard%.2f across $n sampled pairs — the copies are NOT " +
        "text-distinct. Was an already-scaled directory re-scaled? " +
        "(cipher composition collapses copies; scale from the base sf dir)")
  }

  /** Order-independent per-table digests of a generated directory — the
    * provenance record that makes cross-round scale benches comparable:
    * regenerating a fixture changes absolute timings' substrate, and
    * without a digest there is no way to verify two rounds benched the
    * same bytes. One `Quality.tableDigest` aggregate per table (all
    * columns, Spark-canonical string forms — Spark-vs-Spark stable),
    * written as one JSON line per table to `$outDir/DIGESTS.json`. */
  def writeDigests(spark: SparkSession, outDir: String, srcDir: String,
      copies: Int): Unit = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val entries = tables.map { t =>
      val df = spark.read.parquet(s"$outDir/$t.parquet")
      val r = graft.ops.Quality.tableDigest(df, df.columns.toSeq).head()
      s"""  "$t": {"digest": ${r.getLong(0)}, "n_rows": ${r.getLong(1)}}"""
    }
    val json = "{\n" +
      "  \"generator\": \"graft.tools.GenScale\",\n" +
      s"""  "source": "$srcDir",\n  "copies": $copies,\n""" +
      "  \"tables\": {\n" +
      entries.map("  " + _).mkString(",\n") + "\n  }\n}\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "DIGESTS.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def run(spark: SparkSession, srcDir: String, outDir: String,
      copies: Int): Unit = {
    new java.io.File(outDir).mkdirs()
    // dims: straight byte copies
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1

    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$srcDir/lineitem.parquet")
    // NTZ/LTZ-annotated events round-trip as-is; a legacy TIMESTAMP(NANOS)
    // source arrives as a plain LongType under nanosAsLong=true and would
    // be WRITTEN as an unannotated INT64 — a BIGINT to DuckDB, breaking
    // every timestamp oracle on the scaled dir. Normalize that one shape
    // to a real timestamp before scaling (Tables.load still exercises the
    // shim on NTZ dirs, which is what the driver ships today).
    val events = {
      val raw = spark.read.parquet(s"$srcDir/events.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        graft.core.Tables.normalizeEventTs(raw)
      else raw
    }
    val documents = spark.read.parquet(s"$srcDir/documents.parquet")
    val embeddings = spark.read.parquet(s"$srcDir/embeddings.parquet")

    val orderSpan = span(orders, "o_orderkey")
    val eidSpan = span(events, "event_id")
    val uidSpan = span(events, "user_id")
    val didSpan = span(documents, "doc_id")
    val vidSpan = span(embeddings, "vec_id")

    def scaled(base: DataFrame)(tf: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => tf(base, i)).reduce(_ unionByName _)

    require(copies <= GenScale.MaxTextCopies,
      s"at most ${GenScale.MaxTextCopies} text-distinct copies supported")

    write(scaled(orders) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderSpan))
    }, s"$outDir/orders.parquet", 8)

    write(scaled(lineitem) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderSpan))
    }, s"$outDir/lineitem.parquet", 32)

    write(scaled(events) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * eidSpan))
        .withColumn("user_id", col("user_id") + lit(i * uidSpan))
    }, s"$outDir/events.parquet", 16)

    write(scaled(documents) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * didSpan))
        .withColumn("text",
          translate(col("text"), Lower + Upper + Digits, charMap(i)))
    }, s"$outDir/documents.parquet", 16)

    write(scaled(embeddings) { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vidSpan))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(hash(j, $i), 2)) AS FLOAT))"))
    }, s"$outDir/embeddings.parquet", 16)

    // loud fixture-integrity gate + provenance digests, every generation
    verifyCopyDistinctness(spark, srcDir, outDir, copies, didSpan)
    writeDigests(spark, outDir, srcDir, copies)
  }

  private def write(df: DataFrame, path: String, parts: Int): Unit =
    df.repartition(parts).write.mode("overwrite").parquet(path)
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** BPE tokenizer: hand-computed merges, greedy-apply semantics (the
  * doubled-space replace trick), lossless-ness, and plan shape. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns hand-computable merges with deterministic ties") {
    // freqs: "abab" x3, "ab" x2 → pairs: (a,b)=8, (b,a)=3 → merge 1 = ab
    // then: (ab,ab)=3 → merge 2 = abab
    val df = Seq.fill(3)("abab").toDF("text")
      .union(Seq.fill(2)("ab").toDF("text"))
    val m = Bpe.train(df, "text", 2)
    assert(m.map(x => (x.lhs, x.rhs, x.count)) ==
      Seq(("a", "b", 8L), ("ab", "ab", 3L)))
  }

  test("merge application is greedy left-to-right: [a,a,a] -> [aa,a]") {
    val df = Seq("aaa", "aaa").toDF("text")
    val m = Bpe.train(df, "text", 1)
    assert(m.head.lhs == "a" && m.head.rhs == "a")
    val enc = Bpe.encode(Seq("aaa").toDF("text"), "text", m)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(enc == Seq("aa", "a"))
  }

  test("merges stop early when no pair remains") {
    val df = Seq("ab", "ab").toDF("text")
    val m = Bpe.train(df, "text", 10)
    // "ab" -> merge(a,b); then every word is a single symbol: no pairs
    assert(m.size == 1)
    assert(m.head.lhs == "a" && m.head.rhs == "b")
  }

  test("encode is lossless and compresses on real docs") {
    val docs = graft.core.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text")
    val merges = Bpe.train(docs, "text", 8)
    assert(merges.size == 8)
    val enc = Bpe.encode(docs, "text", merges)
    // lossless: concatenating subwords reproduces the lowercased,
    // space-stripped text
    val broken = enc.filter(
      array_join(col("bpe_tokens"), "") =!=
        regexp_replace(lower(col("text")), " ", "")).count()
    assert(broken == 0)
    // compresses: strictly fewer tokens than characters-in-words
    val agg = enc.agg(
      sum("n_bpe_tokens"),
      sum(length(regexp_replace(lower(col("text")), " ", "")))).head()
    assert(agg.getLong(0) < agg.getLong(1))
    // more merges never increase the token count
    val merges4 = merges.take(4)
    val n4 = Bpe.encode(docs, "text", merges4)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(agg.getLong(0) <= n4)
  }

  test("encode runs unchanged on a stream (stateless projection) " +
      "and matches batch") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = graft.core.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text")
    val merges = Bpe.train(docs, "text", 4)
    val want = Bpe.encode(docs, "text", merges)
      .select(col("doc_id"), md5(array_join(col("bpe_tokens"), " ")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-bpest").toString
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Bpe.encode(stream, "text", merges)
      .select(col("doc_id"), md5(array_join(col("bpe_tokens"), " ")).as("h"))
      .writeStream.outputMode("append").format("memory").queryName("bpe_st")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("bpe_st")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == want.size && got == want)
  }

  test("token ids: vocab covers every emitted subword, ids roundtrip, " +
      "unseen characters surface as null OOV") {
    val docs = graft.core.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text")
    val merges = Bpe.train(docs, "text", 8)
    val vocab = Bpe.tokenVocab(docs, "text", merges)
    // ids are dense 0..V-1, base chars first then merges by rank
    assert(vocab.map(_._1) == vocab.indices.map(_.toLong))
    assert(vocab.takeRight(8).map(_._2) ==
      merges.sortBy(_.rank).map(m => m.lhs + m.rhs))
    val enc = Bpe.encodeIds(docs, "text", merges, vocab)
    assert(enc.filter(exists(col("bpe_ids"), _.isNull)).count() == 0,
      "training-corpus subwords must all be in vocab")
    // roundtrip: ids decode back to the token stream
    val idToTok = typedlit(vocab.toMap)
    assert(enc.filter(
      transform(col("bpe_ids"), i => element_at(idToTok, i)) =!=
        col("bpe_tokens")).count() == 0)
    // a character the training corpus never saw -> null id
    val oov = Bpe.encodeIds(Seq((1L, "π")).toDF("doc_id", "text"),
      "text", merges, vocab)
    assert(oov.select(exists(col("bpe_ids"), _.isNull)).head().getBoolean(0))
  }

  test("encode plan depth is constant in merge count (1024 merges run " +
      "through the same single projection)") {
    val docs = Seq((1L, "abcd"), (2L, "dcba")).toDF("doc_id", "text")
    val big = (1 to 1024).map(k => Bpe.Merge(k, s"x$k", s"y$k", 1L))
    val out = Bpe.encode(docs, "text", big) // no-op merges, huge list
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = out.queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty)
    assert(out.select(col("bpe_tokens")).as[Seq[String]].collect().toSet ==
      Set(Seq("a", "b", "c", "d"), Seq("d", "c", "b", "a")))
  }

  test("encode is a pure projection: no exchange, no UDF") {
    val docs = graft.core.Tables.load(spark, sf001, "documents")
    val merges = Bpe.train(docs, "text", 4)
    val plan = Bpe.encode(docs, "text", merges)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      "encode must not shuffle")
    assert(!plan.toString.contains("BatchEvalPython") &&
      !plan.toString.toLowerCase.contains("scalaudf"),
      "encode must stay in codegen'd builtins")
  }
}

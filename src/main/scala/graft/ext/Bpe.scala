package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer: vocabulary-grain training
  * and row-local encoding — the canonical "train a tokenizer on the
  * corpus, then tokenize the corpus" step of an LLM data pipeline
  * (Sennrich et al. 2016's algorithm, re-expressed as Spark plans).
  *
  * Scale shape (100 TB):
  *   - Training never iterates over the CORPUS: one corpus-wide
  *     word-count aggregate (the only corpus-sized shuffle) collapses it
  *     to a (word, freq) VOCAB — millions of rows at web scale, cached
  *     once. Each merge round is then a vocab-sized pair-count aggregate
  *     plus a 1-row argmax fetch: driver-coordinated bounded iteration,
  *     the same pattern as [[Graph.pageRank]]. Merge application is a
  *     row-local string `replace`; lineage is truncated every
  *     `checkpointEvery` rounds so the plan never grows unbounded.
  *   - Encoding is a pure projection: the learned merge list broadcasts
  *     as an array literal and an `aggregate` HOF folds it over each
  *     word's symbol string — O(1) plan depth regardless of merge count
  *     (a naive chain of `replace` calls would nest the plan
  *     `numMerges` deep and break codegen at real vocab sizes), all
  *     codegen'd builtins, no UDF, no shuffle.
  *
  * Symbol-string representation (shared with the DuckDB oracle, which
  * mirrors the algorithm CTE-for-CTE): a word's symbols are joined by
  * TWO spaces, and every merge pattern carries one boundary space on
  * each side — `" a  b " → " ab "`. The doubled separator makes
  * adjacent matches share no characters, so a single leftmost
  * non-overlapping replace-all (identical semantics in Spark and
  * DuckDB) applies one merge exactly like the classic greedy
  * left-to-right scan: `[a,a,a]` merges to `[aa,a]`, and token
  * boundaries can never false-match inside a longer symbol. Words are
  * lowercased and whitespace-tokenized like the rest of the text
  * stack; no end-of-word marker (merges cannot cross words at vocab
  * grain, so the marker would only distinguish word-final tokens —
  * documented simplification).
  */
object Bpe {

  /** One learned merge: rank-ordered, `lhs + rhs → merged`. */
  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** The tokenizer's word stream: the engine-wide whitespace
    * tokenization ([[TextAnalysis.tokens]]) over lowercased text — ONE
    * definition, shared with the gate queries, so a tokenization tweak
    * can never desynchronize encode from its reported word counts. */
  private[graft] def ltoks(textCol: Column): Column =
    TextAnalysis.tokens(lower(textCol))

  /** Initial symbol string of a word: its characters joined by the
    * doubled separator (no wrap spaces stored; merge steps add them). */
  private def initRepr(w: Column): Column =
    array_join(transform(sequence(lit(1), length(w)),
      i => w.substr(i, lit(1))), "  ")

  private def applyMergeSql(s: Column, a: String, b: String): Column =
    trim(replace(concat(lit(" "), s, lit(" ")),
      lit(s" $a  $b "), lit(s" $a$b ")))

  /** Corpus → (word, freq) vocabulary: the single corpus-sized
    * aggregate of the whole training pass. */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(ltoks(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Learns `numMerges` merges. Ties break deterministically on
    * (count DESC, lhs ASC, rhs ASC). Stops early if no pair remains.
    * Each round runs one vocab-grain aggregate + one-row fetch; the
    * evolving symbol strings localCheckpoint every `checkpointEvery`
    * rounds to truncate lineage. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 16): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    var v = vocab(df, textCol)
      .select(initRepr(col("w")).as("s"), col("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      val toks = split(col("s"), "  ")
      val best = v
        .filter(size(toks) > 1)
        .select(explode(transform(sequence(lit(0), size(toks) - lit(2)),
          i => struct(element_at(toks, i + 1).as("a"),
            element_at(toks, i + 2).as("b")))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(k, a, b, c)
        v = v.select(applyMergeSql(col("s"), a, b).as("s"), col("freq"))
        if (k % checkpointEvery == 0) v = v.localCheckpoint()
        k += 1
      }
    }
    out.result()
  }

  /** Learned merges as a one-row-per-merge frame (the reporting shape
    * of `x_bpe_train`). */
  def trainDf(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    train(df, textCol, numMerges)
      .map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
      .toDF("rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Token-id vocabulary for a trained tokenizer: base symbols (the
    * corpus's distinct word characters, lexicographic) take ids
    * 0..B-1, and merge k's token takes id B+k-1 — deterministic given
    * (corpus, merges), no RNG, no registration order. The base charset
    * is alphabet-bounded (catalog-sized), so the driver fetch is the
    * same bounded class as the co-occurrence brand dictionary. */
  def tokenVocab(df: DataFrame, textCol: String,
      merges: Seq[Merge]): Seq[(Long, String)] = {
    val base = df.select(explode(ltoks(col(textCol))).as("w"))
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("t"))
      .distinct().collect().map(_.getString(0)).sorted
    base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      merges.sortBy(_.rank)
        .map(m => (base.length + m.rank - 1L, m.lhs + m.rhs))
  }

  /** [[tokenVocab]] as a frame — the reporting shape of `x_bpe_vocab`. */
  def tokenVocabDf(df: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    tokenVocab(df, textCol, merges).toDF("token_id", "token")
  }

  /** [[encode]] plus the id stream: `bpe_ids` maps each subword through
    * the broadcast vocabulary (a map literal — row-local, no join).
    * `vocab` comes from [[tokenVocab]] over the TRAINING corpus; a
    * subword of an in-vocabulary character stream cannot miss it (every
    * subword is a base character or a merged token), while a character
    * the training corpus never saw maps to null — the caller's OOV
    * signal. */
  def encodeIds(df: DataFrame, textCol: String, merges: Seq[Merge],
      vocab: Seq[(Long, String)]): DataFrame = {
    val vlit = typedlit(vocab.map { case (id, t) => (t, id) }.toMap)
    encode(df, textCol, merges)
      .withColumn("bpe_ids",
        transform(col("bpe_tokens"), t => element_at(vlit, t)))
  }

  /** Applies a learned merge list to every document: adds
    * `bpe_tokens` (array of subword tokens, word order preserved) and
    * `n_bpe_tokens`. Pure projection — the merge list folds over each
    * word via an `aggregate` HOF (plan depth independent of merge
    * count), so the encode parallelizes embarrassingly and survives
    * any corpus size the scan survives. */
  def encode(df: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val mlit = typedlit(merges.sortBy(_.rank).map(m => (m.lhs, m.rhs)))
    val encWord = (w: Column) =>
      trim(aggregate(mlit, concat(lit(" "), initRepr(w), lit(" ")),
        (acc, m) => replace(acc,
          concat(lit(" "), m("_1"), lit("  "), m("_2"), lit(" ")),
          concat(lit(" "), m("_1"), m("_2"), lit(" ")))))
    val ws = transform(ltoks(col(textCol)), encWord)
    df.withColumn("__ws", ws)
      .withColumn("bpe_tokens",
        flatten(transform(col("__ws"), s => split(s, "  "))))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
      .drop("__ws")
  }
}

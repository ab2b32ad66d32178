package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB shape of the problem:
  *
  *  - exact: hash-groupBy on a content digest. One shuffle keyed by a
  *    16-byte digest — uniformly distributed, no skew, and AQE coalesces
  *    the post-shuffle partitions.
  *  - near-dup: MinHash signatures computed per-row with higher-order
  *    functions (no UDF, no shuffle), then LSH banding so the candidate
  *    join is an equi-join on (band, bandValue) buckets instead of an
  *    O(n²) cross join. Only candidate pairs pay the exact-Jaccard cost.
  *  - SimHash: 64-bit per-row signature; near-dups differ in few bits.
  *
  * Portability note: hashes are built from md5 hex strings (identical in
  * every engine) rather than engine-private hash functions, so results are
  * verifiable against external oracles. MinHash "values" are 16-hex-char
  * strings compared lexicographically — order-isomorphic to the 64-bit
  * integer interpretation.
  */
object Dedup {

  // ---- exact -------------------------------------------------------------

  /** Content digest for exact dedup (md5 of raw text). */
  def contentHash(text: Column): Column = md5(text.cast("binary"))

  /** Keep one row per distinct content hash (min of `idCol` wins —
    * deterministic, unlike dropDuplicates' arbitrary winner). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df.groupBy(contentHash(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__h")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Duplicate-span removal (the C4 / RefinedWeb "line dedup" shape):
    * split each document's token stream into consecutive `span`-token
    * chunks, keep only the globally FIRST occurrence of each distinct
    * chunk (lowest (id, position) wins — deterministic), and reassemble
    * the surviving chunks in document order.
    *
    * Scale shape: chunking is a pure projection (HOF slice over the token
    * array — no explode before the chunk strings exist, so the exploded
    * row count is corpus_tokens/span, not corpus_tokens). The wide window
    * that decides global first-occurrence is keyed on md5(chunk), so its
    * shuffle moves (id, chunk_idx, 16-byte digest) — NEVER the raw span
    * text. The survivor index sets (ints) group by doc id and join back
    * to the documents, which is the single place chunk text crosses the
    * wire; reassembly re-derives the chunks from the doc's own row with
    * the same projection (CPU, no extra shuffle). Chunk identity is md5
    * identity — a 128-bit collision conflating two distinct spans is
    * O(n²/2¹²⁸), the standard content-hash dedup assumption ([[exact]]).
    *
    * Output: (id, n_chunks, n_kept, text_dedup) — docs with no tokens
    * vanish (no chunks), and a fully-duplicated doc keeps an empty
    * text_dedup.
    */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
      span: Int): DataFrame = {
    require(span > 0, "span must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokens(col(textCol))
    val nChunks = ceil(size(toks) / lit(span.toDouble)).cast("int")
    // guard the empty-token case: sequence(0, -1) would DESCEND ([0,-1])
    val chunkArr = when(size(toks) > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * span + 1, lit(span)), " ")))
      .otherwise(array().cast("array<string>"))
    // narrow side: only digests explode and shuffle
    val hashed = df.select(col(idCol),
      posexplode(transform(chunkArr, c => unhex(md5(c.cast("binary")))))
        .as(Seq("chunk_idx", "__h")))
    val w = Window.partitionBy("__h").orderBy(idCol, "chunk_idx")
    val kept = hashed
      .withColumn("__rn", row_number().over(w))
      .groupBy(idCol).agg(
        count(lit(1)).cast("int").as("n_chunks"),
        sum(when(col("__rn") === 1, 1).otherwise(0)).cast("int").as("n_kept"),
        sort_array(collect_list(when(col("__rn") === 1, col("chunk_idx"))))
          .as("__kept"))
    // wide side: one id-keyed join carries the text, reassembly is a HOF
    kept.join(df.select(col(idCol), chunkArr.as("__chunks")), Seq(idCol))
      .select(col(idCol), col("n_chunks"), col("n_kept"),
        array_join(transform(col("__kept"),
          i => element_at(col("__chunks"), i + 1)), " ").as("text_dedup"))
  }

  /** Duplicated-substring detection over OVERLAPPING token windows — the
    * discovery half of exact substring dedup (public method: Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better",
    * which removes every repeated span ≥ 50 tokens via a suffix array;
    * the distributed equivalent of the suffix array's repeat-finding is
    * this stride-1 window-digest self-count). A window is DUPLICATED when
    * its digest occurs more than once corpus-wide — including twice
    * inside one document (self-repetition counts, as in the paper).
    *
    * Differs from [[spanDedup]] (disjoint chunks, first-copy-wins
    * rewrite): overlapping windows catch duplicated passages at ANY
    * offset, the case chunk alignment misses.
    *
    * Scale shape (100 TB): each doc emits (size − w + 1) 16-byte digests;
    * the count aggregation shuffles (digest, partial-count) with map-side
    * combine, and the per-doc regroup shuffles (id, digest) pairs — raw
    * window text never leaves the row pass. The production bound at
    * corpus scale is a two-pass Bloom prepass (first pass builds a filter
    * of once-seen digests, second pass only shuffles candidates) —
    * `functions.BloomOps` has the plumbing; this operator keeps the exact
    * one-pass form the oracle can verify.
    *
    * Output: (id, n_windows, n_dup_windows, dup_ratio); docs with fewer
    * than `w` tokens have no windows and vanish (same convention as
    * [[spanDedup]] for token-less docs). */
  /** Digest array of the stride-1 `w`-token windows of `textCol` (empty
    * for docs with fewer than `w` tokens, null for null text — both
    * vanish under the explode/filter that consumes this) — shared by the
    * exact and the Bloom-prepass substring-dedup paths so both flag the
    * SAME windows. Fused codegen pass (`functions.WindowDigests`): the
    * HOF form (per-window slice + array_join + md5) dominated the whole
    * operator's CPU; the fused pass normalizes the token stream once and
    * runs each md5 straight off the compact buffer. */
  private def windowDigests(df: DataFrame, textCol: String,
      w: Int): Column = {
    graft.functions.WindowDigests.register(df.sparkSession, w)
    // the fused pass lowercases internally (same UTF8String.toLowerCase
    // as the built-in lower())
    graft.functions.WindowDigests.windowDigests(col(textCol), w)
  }

  def windowDupStats(df: DataFrame, textCol: String, idCol: String,
      w: Int): DataFrame = {
    require(w > 0, "window width must be positive")
    val winArr = windowDigests(df, textCol, w)
    val ex = df.select(col(idCol), explode(winArr).as("__h"))
    val counts = ex.groupBy("__h").agg(count(lit(1)).as("__c"))
    ex.join(counts, "__h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_ratio", graft.queries.Fp.r(
        col("n_dup_windows").cast("double") / col("n_windows"), 4))
  }

  /** [[windowDupStats]]'s Bloom-prepass form — the production bound at
    * corpus scale, with EXACTLY the same output (same flagged windows,
    * same counts; the Bloom filter only bounds intermediate volume, it
    * never changes the answer):
    *
    *   - pass 1 (same digest-grain count aggregate as the exact path,
    *     map-side combined): the duplicated digests — count > 1 — are
    *     materialized once (flagged-window volume, typically a small
    *     fraction of the corpus) and folded into ONE Bloom-filter binary
    *     (a few MB regardless of corpus size, the
    *     `Curation.contaminationBloom` shape).
    *   - pass 2: a pure row-local projection re-derives each doc's
    *     window digests and probes the Bloom with a HOF — only PROBABLE
    *     duplicates survive to explode. Bloom false positives are then
    *     removed by an exact join against the materialized dup-digest
    *     set, so the per-doc regroup shuffles candidate windows only —
    *     never the full (id, digest) stream the exact path pays (its
    *     count join + regroup re-shuffle EVERY window; here unique
    *     windows — the overwhelming majority — never leave their row).
    *
    * `expectedDups` sizes the Bloom (false-positive rate only affects
    * candidate volume, not correctness). The default 0 means DERIVE it
    * from the materialized dup-digest set (count + 25% headroom — one
    * cheap job over the checkpointed frame): a fixed constant is wrong
    * at both ends — r18 measured the old 4M default costing 2.3× on the
    * sf0.1 bench (a ~3.6 MB filter built, merged across every map task
    * and shipped in the plan for a few thousand actual dups), while at
    * 100 TB corpus scale 4M would be a silent UNDERsizing whose
    * false-positive rate quietly re-approaches the exact path's explode
    * volume. Output and row set are identical to [[windowDupStats]];
    * docs with fewer than `w` tokens vanish, docs whose windows are all
    * unique report 0 dups. */
  /** Bloom sizing: honor an explicit caller hint (> 0); otherwise count
    * the ALREADY-MATERIALIZED build side (localCheckpoint'ed by every
    * caller, so this is one cheap cached-partition job, not a rescan)
    * and add 25% headroom. Floor 4096 keeps the degenerate small-corpus
    * filter from being all-collisions. Sizing never changes results —
    * false positives are removed by the exact join that follows. */
  private[graft] def bloomSizeHint(build: DataFrame, hint: Long): Long =
    if (hint > 0L) hint
    else math.max(4096L, {
      val n = build.count()
      n + n / 4
    })

  def windowDupStatsBloom(df: DataFrame, textCol: String, idCol: String,
      w: Int, expectedDups: Long = 0L): DataFrame = {
    require(w > 0, "window width must be positive")
    graft.functions.BloomOps.register(df.sparkSession)
    // window CONSTRUCTION (tokenize, slice, join, md5) dominates this
    // operator's CPU — measured 1.5x the whole exact path when pass 2
    // re-derived it from text. Materialize the per-doc digest arrays
    // ONCE (node-local, digest-grain: ~20 bytes/window, no text, no
    // shuffle); the count pass and the scoring pass both read it.
    val wins = df.select(col(idCol), windowDigests(df, textCol, w).as("__wins"))
      .filter(size(col("__wins")) > 0)
      .localCheckpoint()
    // pass 1: exact dup-digest set, materialized once — serves both the
    // bloom aggregate and the false-positive-removing join below
    val dups = wins.select(explode(col("__wins")).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .localCheckpoint()
    // Option(..): zero duplicates aggregate to a null bloom binary —
    // then no window can be a candidate (everything is unique)
    val sizeHint = bloomSizeHint(dups, expectedDups)
    val bytes = Option(dups
      .select(call_function("bloom_filter_agg", xxhash64(col("__h")),
        lit(sizeHint)).as("bf"))
      .head().getAs[Array[Byte]](0))
    val candArr = bytes match {
      case Some(b) => filter(col("__wins"), h =>
        call_function("might_contain", lit(b), xxhash64(h)))
      case None => array().cast("array<binary>")
    }
    // pass 2: projection + candidate-only explode; the exact join drops
    // bloom false positives so the flagged set matches the exact path
    wins
      .select(col(idCol), size(col("__wins")).cast("long").as("n_windows"),
        explode_outer(candArr).as("__h"))
      // LEFT join (not semi): zero-candidate docs keep their null row so
      // they still report n_dup_windows = 0; the right-side marker is
      // null exactly for bloom false positives and the null row
      .join(dups.select(col("__h"), lit(1).as("__dup")), Seq("__h"), "left")
      .groupBy(idCol)
      .agg(first(col("n_windows")).as("n_windows"),
        count(col("__dup")).as("n_dup_windows"))
      .withColumn("dup_ratio", graft.queries.Fp.r(
        col("n_dup_windows").cast("double") / col("n_windows"), 4))
  }

  /** The REWRITE form of exact-substring dedup — the full Lee et al.
    * operator the stats paths above approximate: every duplicated
    * `w`-token window (at ANY offset, corpus-wide) is removed from the
    * text, and the globally FIRST occurrence — min (id, position) —
    * survives. Flagged overlapping windows merge naturally: a duplicated
    * passage of L ≥ w tokens yields L − w + 1 flagged windows whose
    * covered token positions union into the full span.
    *
    * Output: (idCol, text, n_tokens, n_removed) where `text` is the
    * surviving LOWERCASED tokens joined by single spaces (the operator
    * normalizes like the digest pass — reference behavior for training
    * corpora, where text is tokenized downstream anyway). Docs shorter
    * than `w` tokens pass through untouched; a fully-duplicated doc
    * (that is not the first occurrence) comes out empty, not dropped —
    * the caller decides whether to filter empties.
    *
    * Scale shape (100 TB): the digest pass is row-local; the
    * first-occurrence aggregate shuffles (id, pos, digest) triples with
    * map-side combine; flagged occurrences (dup volume) regroup to doc
    * grain as covered-position sets; the final cut joins doc text against
    * that doc-keyed set once and trims row-locally. Window text never
    * shuffles. [[windowDupRemoveBloom]] produces identical output with a
    * Bloom prepass that bounds the SECOND exchange: only
    * bloom-probable candidates explode and regroup for the
    * first-occurrence test. Its pass 1 is the same digest-grain
    * aggregate as here — one (count, min-struct) row per distinct
    * digest per map partition still shuffles, which on a unique-heavy
    * corpus is ~all-window volume; the tighter "unique windows never
    * leave their row" bound belongs to [[windowDupStatsBloom]], whose
    * stats output needs no per-occurrence positions. */
  def windowDupRemove(df: DataFrame, textCol: String, idCol: String,
      w: Int): DataFrame = {
    require(w > 0, "window width must be positive")
    val occ = df
      .select(col(idCol), posexplode(windowDigests(df, textCol, w))
        .as(Seq("__p", "__h")))
    // global first occurrence per DUPLICATED digest (c > 1): min over the
    // (id, pos) struct — lexicographic, total, deterministic
    val firsts = occ.groupBy("__h")
      .agg(count(lit(1)).as("__c"),
        min(struct(col(idCol).as("i"), col("__p").as("p"))).as("__f"))
      .filter(col("__c") > 1)
    // inner join: unique windows drop out here; survivors are flagged
    // unless they ARE the first occurrence
    val flagged = occ.join(firsts, "__h")
      .filter(!(col(idCol) === col("__f.i") && col("__p") === col("__f.p")))
      .select(col(idCol), col("__p"))
    cutCovered(df, textCol, idCol, w, flagged)
  }

  /** [[windowDupRemove]] with a Bloom prepass on the CANDIDATE exchange —
    * EXACTLY the same output (the bloom bounds intermediate volume, never
    * the answer). Precisely which exchange it bounds: pass 1 (dupFirsts)
    * is the same digest-grain aggregate as the exact path — it
    * posexplodes every window and shuffles one (count, min-struct) row
    * per distinct digest per map partition, ~all-window volume on a
    * unique-heavy corpus, because the remove semantics need the global
    * first (id, pos) which no sketch can carry. What the bloom saves is
    * pass 2: only bloom-probable duplicates explode and regroup for the
    * first-occurrence test, and the exact join against the materialized
    * dup-digest set removes bloom false positives before that test. The
    * stronger "unique windows never shuffle at all" bound is
    * [[windowDupStatsBloom]]'s, whose stats-only output doesn't need
    * first-occurrence positions. */
  def windowDupRemoveBloom(df: DataFrame, textCol: String, idCol: String,
      w: Int, expectedDups: Long = 0L): DataFrame = {
    require(w > 0, "window width must be positive")
    graft.functions.BloomOps.register(df.sparkSession)
    // digest arrays materialized once (digest-grain, no text): the
    // dup-count pass and the candidate scoring pass both read it
    val wins = df.select(col(idCol), windowDigests(df, textCol, w).as("__wins"))
      .filter(size(col("__wins")) > 0)
      .localCheckpoint()
    val dupFirsts = wins
      .select(col(idCol), posexplode(col("__wins")).as(Seq("__p", "__h")))
      .groupBy("__h")
      .agg(count(lit(1)).as("__c"),
        min(struct(col(idCol).as("i"), col("__p").as("p"))).as("__f"))
      .filter(col("__c") > 1)
      .localCheckpoint()
    val bytes = Option(dupFirsts
      .select(call_function("bloom_filter_agg", xxhash64(col("__h")),
        lit(bloomSizeHint(dupFirsts, expectedDups))).as("bf"))
      .head().getAs[Array[Byte]](0))
    val candArr = bytes match {
      case Some(b) => filter(
        transform(col("__wins"), (h, i) =>
          struct(i.as("p"), h.as("h"))),
        s => call_function("might_contain", lit(b), xxhash64(s("h"))))
      case None => array().cast("array<struct<p:int,h:binary>>")
    }
    val flagged = wins
      .select(col(idCol), explode(candArr).as("__c0"))
      .select(col(idCol), col("__c0.p").as("__p"), col("__c0.h").as("__h"))
      // inner join drops bloom false positives (and would drop unique
      // windows, but those never probed true in the first place)
      .join(dupFirsts.select(col("__h"), col("__f")), "__h")
      .filter(!(col(idCol) === col("__f.i") && col("__p") === col("__f.p")))
      .select(col(idCol), col("__p"))
    cutCovered(df, textCol, idCol, w, flagged)
  }

  /** Shared cut stage: union flagged windows [p, p+w) into covered token
    * positions per doc, join back doc-keyed, trim row-locally. The
    * per-token `array_contains` probe is O(|covered|) — fine because
    * covered sets are dup-volume per doc; heavily-duplicated docs are
    * exactly the ones about to lose those tokens anyway. */
  private def cutCovered(df: DataFrame, textCol: String, idCol: String,
      w: Int, flagged: DataFrame): DataFrame = {
    val covered = flagged
      .select(col(idCol),
        explode(sequence(col("__p"), col("__p") + (w - 1))).as("__j"))
      .groupBy(idCol).agg(collect_set(col("__j")).as("__cov"))
    df.select(col(idCol),
        coalesce(TextAnalysis.tokens(lower(col(textCol))),
          array().cast("array<string>")).as("__toks"))
      .join(covered, Seq(idCol), "left")
      .withColumn("__keep",
        when(col("__cov").isNull, col("__toks"))
          .otherwise(filter(col("__toks"),
            (t, i) => !array_contains(col("__cov"), i))))
      .select(col(idCol),
        concat_ws(" ", col("__keep")).as("text"),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__keep"))).cast("long")
          .as("n_removed"))
  }

  // ---- MinHash + LSH -----------------------------------------------------

  /** n-word shingles over the lowercase token stream. Unigram minhash
    * collapses on shared-vocabulary corpora (every doc uses the same words);
    * shingles capture word ORDER so only near-identical text collides. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** One MinHash value: min over the shingle set of md5("<seed>:" + s),
    * truncated to 16 hex chars (lexicographic min ≡ 64-bit integer min).
    * Pure per-row expression — no shuffle, no UDF. */
  def minhash(set: Column, seed: Int): Column =
    array_min(transform(set,
      t => substring(md5(concat(lit(s"$seed:"), t).cast("binary")), 1, 16)))

  /** k-wide signature as individual columns mh0..mh{k-1}, via the fused
    * per-row [[graft.functions.MinHashSig]] codegen expression (one string
    * pass + k·|shingles| md5 calls — no interpreted lambdas, no shuffle).
    * Docs with fewer than `shingleN` tokens are dropped (no signature). */
  def withMinhashSignature(df: DataFrame, textCol: String, k: Int = 8,
      shingleN: Int = 3): DataFrame = {
    graft.functions.MinHashSig.register(df.sparkSession, shingleN, k)
    val sig = graft.functions.MinHashSig.minhashSig(col(textCol), shingleN, k)
    // one ordered projection (NOT withColumns(Map), whose hash-map iteration
    // order would scramble the mh0..mh{k-1} schema order for k > 4)
    df.withColumn("__m", sig)
      .filter(col("__m").isNotNull)
      .select(df.columns.toIndexedSeq.map(col) ++
        (0 until k).map(i => col("__m.sig")(i).as(s"mh$i")): _*)
  }

  /** LSH band value: digest of `rowsPerBand` adjacent signature columns.
    * Docs agreeing on all hashes in any band become candidates. */
  def bandValue(sig: Seq[Column]): Column =
    md5(concat_ws("|", sig: _*).cast("binary"))

  /** Guarded access into a stored signature index's `sig` array: the
    * elements are non-null by construction ([[signatureIndex]] filters
    * null signatures), so a null read means position `i` is OUT OF RANGE
    * — the caller's `k` is wider than the index was built with. Without
    * this guard, concat_ws inside [[bandValue]] silently drops the null
    * and band digests collide/diverge, degrading candidate recall with
    * no error. Raise loudly instead. (A k NARROWER than the stored index
    * is fine: seeds are positional, so a prefix is itself a valid
    * k-signature.)
    *
    * ONE branch per row carries the whole guard: element 0 (read exactly
    * once per row, in band 0) checks `size(sig) >= k` and raises OUR
    * message; every other element is a plain positional read. The guard
    * expression is part of the same banding projection row, and Spark
    * evaluates every projected expression for a row it emits (when()
    * short-circuits only its own branches), so a short signature can
    * never slip through silently — and codegen's in-order emission makes
    * the size check fire BEFORE any out-of-range positional read could
    * surface ANSI's positionless INVALID_ARRAY_INDEX (the k-wider spec
    * test pins that message ordering). r16 guarded all k elements with
    * get()+when each, which measured 21% on `x_dedup_incremental` at
    * sf1; this form measures at the unguarded cost (A/B table in
    * docs/SCALING.md §r17). */
  private def sigAt(i: Int, k: Int): Column =
    if (i == 0)
      // the isNull arm guards a NULL sig array too: signatureIndex never
      // writes one, but a hand-built index could — and under ANSI,
      // size(NULL) is NULL, the when-condition would be false, and
      // sig(0) would yield silently-null band digests where the
      // contract is raise-loudly
      when(size(col("sig")).isNull || size(col("sig")) < k, raise_error(lit(
        s"signature index narrower than k=$k (sig null or size(sig) < $k)" +
          " — was the index built with a smaller k?")))
        .otherwise(col("sig")(0))
    else col("sig")(i)

  /** Candidate near-duplicate pairs (aId < bId) from banded minhash
    * signatures, with exact shingle-set Jaccard computed per candidate
    * pair. Docs shorter than one shingle are excluded (no signature).
    *
    * Shape at scale: signatures + distinct-shingle sets come from ONE
    * fused per-row codegen pass ([[graft.functions.MinHashSig]] — no
    * shuffle, no interpreted lambdas); the only wide operations are the
    * band equi-join (shuffle carries (id, 16-byte band digest) rows, never
    * all-pairs) and the two id-joins that fetch shingle sets for the few
    * surviving candidates. Exact Jaccard is a per-pair array intersection
    * on those candidates only. The signature table is persisted because
    * band join + both Jaccard fetches read it; at warehouse scale it is
    * written to a table once and reused across dedup runs. */
  def nearDupPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 2, shingleN: Int = 3): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    graft.functions.MinHashSig.register(df.sparkSession, shingleN, k)
    val sig = graft.core.Tables.spread(df)
      .select(col(idCol),
        graft.functions.MinHashSig.minhashSig(col(textCol), shingleN, k).as("__m"))
      .filter(col("__m").isNotNull)
      .select(col(idCol), col("__m.sig").as("__sig"),
        col("__m.dsh").as("__dsh"), col("__m.n_shingles").as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // long-format (id, bandIdx, bandVal) so one equi-join covers all bands
    val long = sig.select(col(idCol),
      posexplode(array((0 until bands).map(b => bandValue(
        (0 until rows).map(r => col("__sig")(b * rows + r)))): _*))
        .as(Seq("band_idx", "band_val")))
    val cand = long.select(col(idCol).as("a_id"), col("band_idx"), col("band_val"))
      .join(long.select(col(idCol).as("b_id"), col("band_idx"), col("band_val")),
        Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // exact Jaccard per candidate: |A∩B| via native array_intersect on the
    // two fetched distinct-shingle sets
    cand
      .join(sig.select(col(idCol).as("a_id"), col("__dsh").as("__da"),
        col("__n").as("__na")), "a_id")
      .join(sig.select(col(idCol).as("b_id"), col("__dsh").as("__db"),
        col("__n").as("__nb")), "b_id")
      .withColumn("__inter", size(array_intersect(col("__da"), col("__db"))).cast("long"))
      .select(col("a_id"), col("b_id"),
        (col("__inter").cast("double") /
          nullif(col("__na") + col("__nb") - col("__inter"), lit(0L)))
          .as("jaccard"))
  }

  /** The signature index for incremental dedup: one row per doc with its
    * minhash signature array, distinct shingle set and shingle count —
    * exactly what [[nearDupPairs]] computes internally. Write it ONCE per
    * corpus (parquet next to the corpus); daily batches then dedup
    * against the index without ever rescanning corpus text. */
  def signatureIndex(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, shingleN: Int = 3): DataFrame = {
    graft.functions.MinHashSig.register(df.sparkSession, shingleN, k)
    graft.core.Tables.spread(df)
      .select(col(idCol),
        graft.functions.MinHashSig.minhashSig(col(textCol), shingleN, k)
          .as("__m"))
      .filter(col("__m").isNotNull)
      .select(col(idCol), col("__m.sig").as("sig"),
        col("__m.dsh").as("dsh"), col("__m.n_shingles").as("n_shingles"))
  }

  /** Incremental near-dup pairs — the daily-ingest shape: candidates come
    * from banding the NEW batch against an EXISTING [[signatureIndex]],
    * so the corpus is never rescanned and the join is new×old only,
    * never old×old (the index side was already deduped when it was
    * built). Returns (new_id, old_id, jaccard) for the new batch's
    * collisions; drop new ids whose best jaccard clears the threshold,
    * then append the survivors' signatures to the index. */
  def incrementalNearDupPairs(newBatch: DataFrame, textCol: String,
      idCol: String, index: DataFrame, k: Int = 8,
      bands: Int = 2): DataFrame =
    // NO persist of the batch signatures: this API runs once per ingest
    // batch in a long-lived session, and cacheManager would pin a
    // persisted frame until an explicit unpersist nobody holds a handle
    // for. The two consumers (band join + jaccard fetch) recompute the
    // signature pass instead — one extra codegen scan of the NEW BATCH,
    // which is batch-sized by definition, against the full corpus index
    // either way. A caller that has already materialized both indexes
    // (the stored-table deployment shape) uses
    // [[incrementalNearDupPairsFromIndex]] directly.
    incrementalNearDupPairsFromIndex(
      signatureIndex(newBatch, textCol, idCol, k), index, idCol, k, bands)

  /** [[incrementalNearDupPairs]] when the new batch's signatures are
    * already computed (e.g. both sides are stored [[signatureIndex]]
    * tables): new×old banded candidates + exact Jaccard, zero text
    * scans. */
  def incrementalNearDupPairsFromIndex(newIndex: DataFrame,
      index: DataFrame, idCol: String, k: Int = 8,
      bands: Int = 2): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    def long(sig: DataFrame, as: String) = sig.select(col(idCol).as(as),
      posexplode(array((0 until bands).map(b => bandValue(
        (0 until rows).map(r => sigAt(b * rows + r, k)))): _*))
        .as(Seq("band_idx", "band_val")))
    val cand = long(newIndex, "new_id")
      .join(long(index, "old_id"), Seq("band_idx", "band_val"))
      .filter(col("new_id") =!= col("old_id"))
      .select("new_id", "old_id").distinct()
    cand
      .join(newIndex.select(col(idCol).as("new_id"), col("dsh").as("__da"),
        col("n_shingles").as("__na")), "new_id")
      .join(index.select(col(idCol).as("old_id"), col("dsh").as("__db"),
        col("n_shingles").as("__nb")), "old_id")
      .withColumn("__inter",
        size(array_intersect(col("__da"), col("__db"))).cast("long"))
      .select(col("new_id"), col("old_id"),
        (col("__inter").cast("double") /
          nullif(col("__na") + col("__nb") - col("__inter"), lit(0L)))
          .as("jaccard"))
  }

  /** [[nearDupPairs]] over an already-materialized [[signatureIndex]]
    * (the stored-table deployment shape): banded within-index candidate
    * pairs + exact Jaccard, zero text scans, no internal persist — the
    * caller owns the index's materialization (a stored table reads at
    * scan cost; an in-session frame should be checkpointed ONCE instead
    * of letting each of the three consumers here re-run its lineage). */
  def nearDupPairsFromIndex(index: DataFrame, idCol: String,
      k: Int = 8, bands: Int = 2): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val long = index.select(col(idCol),
      posexplode(array((0 until bands).map(b => bandValue(
        (0 until rows).map(r => sigAt(b * rows + r, k)))): _*))
        .as(Seq("band_idx", "band_val")))
    val cand = long.select(col(idCol).as("a_id"), col("band_idx"), col("band_val"))
      .join(long.select(col(idCol).as("b_id"), col("band_idx"), col("band_val")),
        Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(index.select(col(idCol).as("a_id"), col("dsh").as("__da"),
        col("n_shingles").as("__na")), "a_id")
      .join(index.select(col(idCol).as("b_id"), col("dsh").as("__db"),
        col("n_shingles").as("__nb")), "b_id")
      .withColumn("__inter",
        size(array_intersect(col("__da"), col("__db"))).cast("long"))
      .select(col("a_id"), col("b_id"),
        (col("__inter").cast("double") /
          nullif(col("__na") + col("__nb") - col("__inter"), lit(0L)))
          .as("jaccard"))
  }

  /** Near-dup removal: drop the higher id of every candidate pair whose
    * exact Jaccard clears the threshold. */
  def nearDedup(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, k: Int = 8, bands: Int = 2): DataFrame = {
    val drop = nearDupPairs(df, textCol, idCol, k, bands)
      .filter(col("jaccard") >= threshold)
      .select(col("b_id").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Connected components over candidate pairs (the missing step between
    * pairwise near-dup detection and dedup groups: A~B and B~C must land
    * in ONE cluster even though (A,C) never surfaced as a pair). Returns
    * (id, cluster_id) with cluster_id = the smallest member id.
    *
    * Iterative min-label propagation: each round every vertex takes the
    * minimum label among itself and its neighbors — one equi-join + one
    * aggregation per round, all distributed, converging in O(component
    * diameter) rounds. Near-dup clusters are shallow (dups of dups of one
    * original), so a handful of rounds closes them; rounds run FUSED in
    * pairs — one persist + one count() action (a single scalar to the
    * driver, never the data) covers two propagation hops, halving driver
    * round-trips on deeper chains. At larger diameters the classic
    * large-star/small-star contraction would cut the hop count itself —
    * same join shape.
    *
    * Runs to the fix point; `maxIter` is a safety rail against adversarial
    * diameters and THROWS when exceeded rather than silently returning
    * split clusters (correctness is the operator's whole point). The
    * returned frame is locally checkpointed so callers get converged
    * labels without holding the iteration's cached lineage — its storage
    * is reclaimed by the context cleaner once the result is dropped.
    */
  def clusterPairs(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // both edge directions from ONE pass over `pairs` (explode, not
    // union-of-self: the input is typically an expensive un-cached pipeline
    // — LSH candidate generation — and a self-union evaluates it twice)
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .distinct().persist(MEMORY_AND_DISK)
    // materialize NOW: the propagation rounds reference `edges` several
    // times in one job, and an unmaterialized cache would re-run the
    // (expensive) upstream pair pipeline once per reference
    val nEdges = edges.count()
    // Size-gated local fast path (r18; the r13 bitmap-dispatch
    // discipline): below `spark.graft.cc.localMaxEdges` directed edges
    // (default 1M ≈ tens of MB collected — the same bounded-collect
    // budget class as IVF centroids / the BPE vocab) with integral ids,
    // min-label connected components runs as a driver union-find over
    // the ALREADY-MATERIALIZED edge cache: identical labels by
    // construction (min member id per component is unique), zero
    // iteration rounds, zero per-round checkpoints/convergence counts —
    // the distributed loop's fixed cost is ~3 driver-blocking actions
    // per two hops, which dominates small contracted graphs
    // (clusterPairsIncremental, streaming micro-batches, bench-scale
    // corpora). Larger graphs or non-integral ids fall through to the
    // distributed loop unchanged — no correctness cliff, only a
    // latency one, and the threshold is conf-tunable per deployment.
    val integralIds = edges.schema("src").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val localMax = {
      val raw = pairs.sparkSession.conf
        .get("spark.graft.cc.localMaxEdges", "1000000")
      try raw.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.cc.localMaxEdges must be a long, got '$raw'")
      }
    }
    if (integralIds && nEdges <= localMax) {
      localMinLabel(edges) match {
        case Some(out) =>
          edges.unpersist()
          lastRounds = 0
          return out
        case None => () // null endpoint: distributed loop is authoritative
      }
    }
    // one propagation round; carries the pre-round label as `prev` so the
    // convergence check is a filter on the SAME materialization, not a
    // second join-and-count pass
    def round(l: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(l.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nbr_label"))
      l.select("id", "label").join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"),
          col("label").as("prev"))
    }
    val init = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"), col("id").as("prev"))
    // TWO propagation rounds per materialized lineage, every iteration:
    // `prev` carries the label between the fused rounds, so
    // `label != prev` tests whether the LAST round changed anything —
    // equality there is the fix point regardless of what the first fused
    // round did. Near-dup clusters are shallow (star-ish), so the typical
    // run converges within the first lineage and pays exactly ONE driver
    // action; deeper chains pay one materialize+count per TWO hops
    // instead of per hop. localCheckpoint (not persist) each iteration:
    // persist truncates only the computation, the LOGICAL plan keeps
    // nesting two joins per round and analyzer cost explodes on deep
    // chains — checkpointing truncates both.
    var labels = round(round(init)).localCheckpoint()
    var changed = labels.filter(col("label") =!= col("prev")).count()
    var iter = 2
    while (changed > 0 && iter < maxIter) {
      val next = round(round(labels)).localCheckpoint()
      changed = next.filter(col("label") =!= col("prev")).count()
      labels = next
      iter += 2
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"clusterPairs: min-label propagation did not converge in $maxIter " +
          "rounds (component diameter exceeds the safety rail); raise " +
          "maxIter or switch to clusterPairsStar (large-star/small-star)")
    lastRounds = iter
    val out = labels.select(col("id"), col("label").as("cluster_id"))
    edges.unpersist()
    out
  }

  /** Dev telemetry: propagation/contraction rounds the LAST
    * clusterPairs/clusterPairsStar call on this JVM executed — scaling
    * attribution only (docs/SCALING.md), never a correctness input.
    * 0 = the size-gated local union-find path ran (no rounds). */
  @volatile private[graft] var lastRounds: Int = 0

  /** Driver union-find over a bounded, materialized directed-edge frame
    * (both directions present): returns (id, cluster_id) with
    * cluster_id = smallest member id — bit-identical to the converged
    * min-label propagation. Ids are cast to long for the flat maps and
    * cast back to the input type on the way out, so the caller-visible
    * schema matches the distributed path's. None when an endpoint is
    * null (getLong would coerce it to 0) — caller falls through to the
    * distributed loop, whose null semantics stay authoritative. */
  private def localMinLabel(edges: DataFrame): Option[DataFrame] = {
    val idType = edges.schema("src").dataType
    // null screen BEFORE the collect, in-plan on the already-materialized
    // edge cache (one cheap action) — a nullable-id graph with an actual
    // null used to pay the full bounded collect only to discard it here.
    // Schema-level non-nullability skips even that action.
    val mayHaveNulls =
      edges.schema("src").nullable || edges.schema("dst").nullable
    if (mayHaveNulls &&
        !edges.filter(col("src").isNull || col("dst").isNull).isEmpty)
      return None
    val rows = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labels = parent.keysIterator
      .map(v => org.apache.spark.sql.Row(v, find(v))).toSeq
    val spark = edges.sparkSession
    val longSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    Some(spark.createDataFrame(
        spark.sparkContext.parallelize(labels,
          math.max(1, math.min(spark.sparkContext.defaultParallelism,
            1 + labels.size / 4096))),
        longSchema)
      .select(col("id").cast(idType).as("id"),
        col("cluster_id").cast(idType).as("cluster_id")))
  }

  /** Connected components via alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the ADVERSARIAL-DIAMETER path: converges in O(log n)
    * rounds on any graph, where [[clusterPairs]]' min-label propagation
    * pays O(diameter) rounds. Per round it costs two groupBy+join passes
    * (vs one for propagation), so propagation stays the default for
    * near-dup graphs (shallow stars); switch here when components can be
    * long chains — sessionized click paths, citation chains, linked
    * records.
    *
    * Same contract as [[clusterPairs]]: returns (id, cluster_id),
    * cluster_id = smallest member id; throws rather than returning split
    * clusters if `maxIter` rounds don't reach the star fix point.
    */
  def clusterPairsStar(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 25): DataFrame = {
    // canonical undirected edge set: (u < v), no loops, distinct
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()

    // large-star: every neighbor v > u rewires to m = min(Γ(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val dir = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = dir.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      canon(dir.join(m, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    // small-star: all smaller neighbors (and u itself) rewire to the min
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = dir.groupBy("u").agg(min("v").as("m"))
      canon(dir.join(m, "u")
        .select(explode(array(
          struct(col("v").as("x"), col("m").as("y")),
          struct(col("u").as("x"), col("m").as("y")))).as("e"))
        .select(col("e.x").as("u"), col("e.y").as("v")))
    }
    // edge-set fingerprint: one tiny aggregate per round (count + order-
    // independent hash sum) — a scalar to the driver, never the data
    def fingerprint(e: DataFrame): (Long, String) = {
      // decimal sum: a long sum of 64-bit hashes overflows under ANSI
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).first()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
    }

    // localCheckpoint each round: truncates BOTH the lineage and the
    // logical plan — without it the plan nests two star passes per round
    // and analyzer time explodes after ~8 rounds (propagation gets away
    // without this because shallow graphs converge in 2-3 rounds)
    var edges = canon(pairs.select(col(aCol).as("u"), col(bCol).as("v")))
      .localCheckpoint()
    var fp = fingerprint(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      edges = next
      fp = nfp
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"clusterPairsStar: star contraction did not reach the fix point " +
          s"in $maxIter rounds; raise maxIter")
    lastRounds = iter
    // fix point = disjoint stars canonicalized as (center, leaf) with
    // center < leaf: leaves take the center's label, centers themselves.
    // canon() drops self-loops, so an id appearing ONLY as (x, x) would
    // vanish — restore every input node, defaulting to its own label,
    // to keep the clusterPairs contract (singletons included).
    val nodes = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id"))).distinct()
    val labels = edges.select(col("u").as("id"), col("u").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("u").as("cluster_id")))
      .distinct()
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Incremental connected-components maintenance: fold one ingest
    * batch's near-dup pairs into an existing corpus clustering without
    * re-running components over the corpus — the cluster-table analogue
    * of [[incrementalNearDupPairs]]' signature-index maintenance, and
    * the last piece of the incremental dedup story (index → pairs →
    * clusters).
    *
    * Inputs: `existing` = the maintained `(id, cluster_id)` table, one
    * row per corpus doc including singletons, cluster_id = smallest
    * member id (i.e. a CONVERGED [[clusterPairs]]/[[clusterPairsStar]]
    * output extended with self-labeled singletons); `newIds` = every doc
    * id of the new batch as a column `id` (singletons included; disjoint
    * from `existing`); `newPairs` = the batch's near-dup pairs — the
    * new×old shape [[incrementalNearDupPairs]] returns plus the batch's
    * internal new×new pairs (old×old pairs are legal too). Every pair
    * endpoint must appear in `existing` or `newIds`; unknown endpoints
    * influence labels but emit no output row.
    *
    * Shape: CONTRACT each pair endpoint to its current cluster label
    * (batch-grain: only the touched corpus rows are fetched, via a
    * broadcast semi-join), run [[clusterPairs]] on the contracted graph
    * — its vertices are touched cluster reps + new ids, never
    * corpus-grain — then EXPAND by broadcasting the batch-grain relabel
    * map back over `existing`. The corpus is SCANNED twice (label fetch,
    * relabel) and SHUFFLED zero times; a batch re-cluster would pay
    * O(diameter) corpus-grain shuffles instead. `newPairs` is evaluated
    * twice (endpoint extraction + contraction) — cache upstream if it is
    * an expensive LSH pipeline.
    *
    * Exactness (the gate oracle checks it literally against a full
    * batch re-cluster): contracting a converged min-label clustering
    * preserves connectivity — new edges connect exactly the clusters
    * whose representatives the contracted edges connect — and mins
    * compose: min over merged clusters of per-cluster min ids = the
    * merged component's smallest member id. */
  def clusterPairsIncremental(existing: DataFrame, newIds: DataFrame,
      newPairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 50): DataFrame = {
    val merged = contractedMerge(existing, newPairs, aCol, bCol, maxIter)
    val updated = existing
      .join(broadcast(merged.select(col("id").as("cluster_id"),
        col("cluster_id").as("__m"))), Seq("cluster_id"), "left")
      .select(col("id"),
        coalesce(col("__m"), col("cluster_id")).as("cluster_id"))
    val fresh = newIds.select(col("id"))
      .join(broadcast(merged.select(col("id"),
        col("cluster_id").as("__m"))), Seq("id"), "left")
      .select(col("id"), coalesce(col("__m"), col("id")).as("cluster_id"))
    updated.unionByName(fresh)
  }

  /** The CONTRACT + CLUSTER core of [[clusterPairsIncremental]], exposed
    * for sinks that expand DELTA-wise (only the touched corpus rows) —
    * [[graft.streaming.Streams.clusterBatchIncremental]]. Returns the
    * batch-grain relabel map `(id = old cluster label | new id,
    * cluster_id = smallest merged member id)`, locally checkpointed by
    * [[clusterPairs]]. */
  private[graft] def contractedMerge(existing: DataFrame,
      newPairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int): DataFrame = {
    val pairs = newPairs.select(col(aCol), col(bCol))
    val ends = pairs
      .select(explode(array(col(aCol), col(bCol))).as("id")).distinct()
    // batch-grain: current labels of the touched corpus endpoints only
    val touched = existing.join(broadcast(ends), Seq("id"), "left_semi")
    val la = touched.select(col("id").as(aCol), col("cluster_id").as("__la"))
    val lb = touched.select(col("id").as(bCol), col("cluster_id").as("__lb"))
    val contracted = pairs
      .join(la, Seq(aCol), "left")
      .join(lb, Seq(bCol), "left")
      .select(coalesce(col("__la"), col(aCol)).as("__ca"),
        coalesce(col("__lb"), col(bCol)).as("__cb"))
      .filter(col("__ca") =!= col("__cb"))
    clusterPairs(contracted, "__ca", "__cb", maxIter)
  }

  // ---- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over the token set. Per-token 64-bit hash = first 16 hex
    * chars of md5; bit b contributes +1/-1 to an accumulator; the sign
    * pattern is the signature. Implemented with higher-order functions over
    * a 64-slot accumulator array — still per-row, no shuffle. */
  def simhash(text: Column): Column = {
    val tok = array_distinct(TextAnalysis.tokens(lower(text)))
    // Per token: 64 bits, MSB first, decoded nibble-by-nibble from the first
    // 16 hex chars of md5 (single hex digits — no 64-bit precision issues).
    def tokenBits(t: Column): Column =
      flatten(transform(slice(split(md5(t.cast("binary")), ""), 1, 16), c => {
        val nibble = conv(c, 16, 10).cast("int")
        array(Seq(3, 2, 1, 0).map(k =>
          shiftright(nibble, k).bitwiseAND(lit(1))): _*)
      }))
    // Accumulate +1/-1 votes per bit position across the token set.
    val acc = aggregate(
      tok,
      array((0 until 64).map(_ => lit(0)): _*),
      (a, t) => zip_with(a, tokenBits(t), (x, bit) => x + bit * 2 - 1))
    // Sign pattern → 64-char bit string.
    array_join(transform(acc, x => when(x > 0, "1").otherwise("0")), "")
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingDist(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), x => x))
}

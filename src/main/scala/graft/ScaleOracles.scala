package graft

/** Staged, shardable DuckDB oracle recipes for the queries whose
  * single-statement oracle SQL cannot run at large scale factors.
  *
  * At sf10 (500k documents / 200k vectors) three oracles OOM DuckDB on
  * their own per-token unnest (x_text_features, x_token_entropy,
  * x_text_tfidf) and the two LSH pair-join oracles would unnest ~5e9
  * rows. Each gets an EQUIVALENT multi-statement recipe that bounds
  * memory the same way the engine does:
  *
  *   - per-document decomposable features run per doc-id shard into an
  *     accumulator temp table (`__SHARD__` / `__NSHARDS__` placeholders);
  *   - tf-idf pre-aggregates (doc, distinct-term, tf) per shard — the
  *     same "never materialize raw token occurrences" shape as
  *     `TextAnalysis.tfidfTopK`;
  *   - the pair joins compute only the tiny (id, band/bucket) tables per
  *     shard, self-join those for candidates, and evaluate the exact
  *     similarity ONLY on candidate pairs (sharded again for the
  *     per-dimension unnest).
  *
  * Protocol (consumed by tools/check.py --scale): an ordered statement
  * list; every statement but the last is DDL/DML executed for effect
  * (per_shard=true → once per shard with the placeholders substituted);
  * the LAST statement is the result SELECT compared against the engine
  * dump. Equivalence with the committed single-statement oracles is
  * checked by running the full gate with --scale at small SFs.
  */
object ScaleOracles {

  final case class Step(perShard: Boolean, sql: String)

  /** Wrap a per-document-decomposable oracle: run the ORIGINAL statement
    * over one doc-id shard at a time, accumulating rows. Exact because
    * every output row of these queries depends only on its own document. */
  private def docSharded(name: String): Seq[Step] = {
    val orig = SparkEntry.oracleSql(name)
    require(orig.split("FROM documents").length == 2,
      s"$name oracle must reference documents exactly once")
    val sharded = orig.replace("FROM documents",
      "FROM (SELECT * FROM documents WHERE doc_id % __NSHARDS__ = __SHARD__)")
    Seq(
      Step(perShard = false,
        s"CREATE OR REPLACE TEMP TABLE __acc_$name AS SELECT * FROM (\n$orig\n) __q LIMIT 0"),
      Step(perShard = true,
        s"INSERT INTO __acc_$name SELECT * FROM (\n$sharded\n) __q"),
      Step(perShard = false, s"SELECT * FROM __acc_$name"))
  }

  private val tfidf: Seq[Step] = Seq(
    Step(perShard = false,
      """CREATE OR REPLACE TEMP TABLE __tf_tfidf
        |  (doc_id BIGINT, term VARCHAR, tf BIGINT)""".stripMargin),
    Step(perShard = true,
      """INSERT INTO __tf_tfidf
        |WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS term
        |  FROM (SELECT * FROM documents WHERE doc_id % __NSHARDS__ = __SHARD__))
        |SELECT doc_id, term, CAST(count(*) AS BIGINT) FROM tok GROUP BY 1, 2""".stripMargin),
    Step(perShard = false,
      """WITH dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM __tf_tfidf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term, round(tf * ln(n.n / df) + 1e-7, 4) AS tfidf
        |  FROM __tf_tfidf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |  ORDER BY tfidf DESC, term) AS rn FROM scored)
        |SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, tfidf DESC, term""".stripMargin))

  /** Shingle CTE fragment shared by the LSH stages; `__SRC__` is the
    * (possibly filtered) documents source. */
  private val shingleCtes =
    """tok AS (SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ltoks FROM __SRC__),
      |sh AS (SELECT doc_id, list_transform(range(len(ltoks)-2), i -> ltoks[i+1]||' '||ltoks[i+2]||' '||ltoks[i+3]) AS shingles FROM tok WHERE len(ltoks) >= 3)""".stripMargin

  private def mh(seed: Int): String =
    s"list_min(list_transform(shingles, t -> substr(md5('$seed:'||t),1,16))) AS mh$seed"

  private val lshPairs: Seq[Step] = Seq(
    Step(perShard = false,
      "CREATE OR REPLACE TEMP TABLE __bands_lsh (doc_id BIGINT, band_idx INT, band_val VARCHAR)"),
    Step(perShard = true,
      s"""INSERT INTO __bands_lsh
         |WITH ${shingleCtes.replace("__SRC__",
        "(SELECT * FROM documents WHERE doc_id % __NSHARDS__ = __SHARD__)")},
         |sig AS (SELECT doc_id, ${(0 until 8).map(mh).mkString(",\n  ")}
         |FROM sh)
         |SELECT doc_id, 0 AS band_idx, md5(mh0||'|'||mh1||'|'||mh2||'|'||mh3) FROM sig
         |UNION ALL
         |SELECT doc_id, 1, md5(mh4||'|'||mh5||'|'||mh6||'|'||mh7) FROM sig""".stripMargin),
    Step(perShard = false,
      """CREATE OR REPLACE TEMP TABLE __cand_lsh AS
        |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM __bands_lsh a JOIN __bands_lsh b
        |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        | AND a.doc_id < b.doc_id""".stripMargin),
    Step(perShard = false,
      s"""CREATE OR REPLACE TEMP TABLE __sig_lsh AS
         |WITH ${shingleCtes.replace("__SRC__",
        """(SELECT * FROM documents WHERE doc_id IN
          |    (SELECT a_id FROM __cand_lsh UNION SELECT b_id FROM __cand_lsh))""".stripMargin)}
         |SELECT doc_id, list_distinct(shingles) AS dsh FROM sh""".stripMargin),
    Step(perShard = false,
      """WITH jac AS (
        |  SELECT a_id, b_id,
        |    len(list_filter(sa.dsh, x -> list_contains(sb.dsh, x))) AS inter,
        |    len(sa.dsh) + len(sb.dsh) AS tot
        |  FROM __cand_lsh
        |  JOIN __sig_lsh sa ON sa.doc_id = a_id
        |  JOIN __sig_lsh sb ON sb.doc_id = b_id)
        |SELECT a_id, b_id,
        |  round(CAST(inter AS DOUBLE) / nullif(tot - inter, 0) + 1e-7, 4) AS jaccard
        |FROM jac ORDER BY a_id, b_id""".stripMargin))

  private def embNearDup: Seq[Step] = {
    val sigExpr = queries.MiscQueries.planesSql(
      graft.ext.Similarity.hyperplanes(12, 64)).mkString(" || ")
    Seq(
      Step(perShard = false,
        """CREATE OR REPLACE TEMP TABLE __bits_emb AS
          |SELECT greatest(4, least(12,
          |  CAST(ceil(log2(count(*) / 512.0)) AS INT))) AS bits FROM embeddings""".stripMargin),
      Step(perShard = false,
        "CREATE OR REPLACE TEMP TABLE __eb_emb (vec_id BIGINT, bucket VARCHAR)"),
      Step(perShard = true,
        s"""INSERT INTO __eb_emb
           |SELECT vec_id, substr($sigExpr, 1, (SELECT bits FROM __bits_emb)) AS bucket
           |FROM (SELECT * FROM embeddings WHERE vec_id % __NSHARDS__ = __SHARD__)""".stripMargin),
      Step(perShard = false,
        """CREATE OR REPLACE TEMP TABLE __pairs_emb AS
          |SELECT a.vec_id AS a_id, b.vec_id AS b_id
          |FROM __eb_emb a JOIN __eb_emb b
          |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id""".stripMargin),
      Step(perShard = false,
        "CREATE OR REPLACE TEMP TABLE __cos_emb (a_id BIGINT, b_id BIGINT, c DOUBLE)"),
      Step(perShard = true,
        """INSERT INTO __cos_emb
          |WITH pr AS (SELECT a_id, b_id FROM __pairs_emb
          |            WHERE (a_id + b_id) % __NSHARDS__ = __SHARD__),
          |fl AS (SELECT a_id, b_id,
          |              CAST(unnest(ea.embedding) AS DOUBLE) AS av,
          |              CAST(unnest(eb.embedding) AS DOUBLE) AS bv
          |       FROM pr JOIN embeddings ea ON ea.vec_id = a_id
          |               JOIN embeddings eb ON eb.vec_id = b_id)
          |SELECT a_id, b_id,
          |       sum(av * bv) / nullif(sqrt(sum(av * av)) * sqrt(sum(bv * bv)), 0) AS c
          |FROM fl GROUP BY a_id, b_id""".stripMargin),
      Step(perShard = false,
        """SELECT a_id, b_id, round(c + 1e-7, 4) AS cosine
          |FROM __cos_emb WHERE c >= 0.4 ORDER BY a_id, b_id""".stripMargin))
  }

  lazy val all: Map[String, Seq[Step]] = Map(
    "x_text_features" -> docSharded("x_text_features"),
    "x_token_entropy" -> docSharded("x_token_entropy"),
    "x_text_tfidf" -> tfidf,
    "x_dedup_lsh_pairs" -> lshPairs,
    "x_emb_neardup" -> embNearDup)
}

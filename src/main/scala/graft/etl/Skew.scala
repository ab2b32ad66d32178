package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys — the failure mode that kills
  * 100 TB jobs: one `groupBy`/`join` key holding 30% of the rows turns a
  * 1000-executor shuffle into one straggler task (or an OOM).
  *
  * Two standard techniques, both semantics-preserving (results are
  * bit-identical to the plain operation, which is exactly what the DuckDB
  * oracles verify):
  *
  *  - [[saltedAgg]]: two-phase aggregation. Phase 1 groups on
  *    (key, salt) so each heavy key splits across `salts` reducers;
  *    phase 2 merges the partials per key. Works for any algebraic
  *    aggregate (sum/count/min/max — anything with a merge step).
  *    Note Spark's hash aggregate already does map-side partial
  *    aggregation; explicit salting matters when the DISTINCT-key count
  *    per partition is too high for the hash map (spill) or when the
  *    post-shuffle reduce itself is the bottleneck.
  *  - [[saltedJoin]]: replicate-and-salt. The big (skewed) side gets a
  *    deterministic salt in [0, salts); the small side is replicated to
  *    every salt value; the equi-join runs on (key, salt) so a heavy key
  *    fans across `salts` tasks. AQE's skew-join split handles moderate
  *    skew adaptively; explicit salting is the deterministic fallback for
  *    extreme single-key skew (and the only option when the skewed side
  *    feeds a sort-merge join that AQE can't re-split).
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of `det` (pass a unique or
    * near-unique column, e.g. the fact PK). Deterministic so retries and
    * oracle comparisons see the same assignment — `rand()` would not be. */
  def salt(det: Column, salts: Int): Column =
    pmod(xxhash64(det), lit(salts.toLong)).cast("int")

  /** Salt count sized to the DATA, not hardcoded: a fixed salt count is
    * the same fixed-geometry trap as a fixed LSH signature width — at
    * 10× rows each (key, salt) task carries 10× the rows and the
    * heaviest key is a straggler again (sort-merge cost is n·log n per
    * task, so the tail grows superlinearly). Size so the HEAVIEST key's
    * per-salt share stays ≈ `targetRowsPerTask`: worst case one key owns
    * everything (`heavyKeyShare = 1.0`); pass the observed share when a
    * profile exists ([[graft.functions.FreqItems]] heavy hitters).
    * `rows` comes free from [[graft.core.RowCounts.hint]]. The floor
    * keeps small inputs on the historical salts=8 plan; the cap bounds
    * small-side replication (`salts × |small|` rows). */
  def autoSalts(rows: Long, heavyKeyShare: Double = 1.0,
      targetRowsPerTask: Long = 2000000L, minSalts: Int = 8,
      maxSalts: Int = 4096): Int = {
    require(heavyKeyShare > 0 && heavyKeyShare <= 1.0, "share in (0,1]")
    val heavy = math.max(1.0, rows * heavyKeyShare)
    val needed = math.ceil(heavy / targetRowsPerTask).toInt
    math.min(maxSalts, math.max(minSalts, needed))
  }

  /** Two-phase salted aggregation: `aggs` run per (key, salt), then their
    * merge (`merges`, matched by output name) runs per key. */
  def saltedAgg(df: DataFrame, key: Seq[String], det: Column, salts: Int,
      aggs: Seq[Column], merges: Seq[Column]): DataFrame = {
    val phase1 = df.withColumn("__salt", salt(det, salts))
      .groupBy((key :+ "__salt").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    phase1.groupBy(key.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join of a skewed big side against a small side.
    * Inner-join semantics on `bigKey === smallKey`; identical output to
    * the plain join. The small side is replicated `salts` times — keep it
    * broadcast-sized per salt (dim tables), or size `salts` to the skew
    * factor, not the cluster. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, det: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(det, salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated,
      saltedBig(bigKey) === replicated(smallKey) &&
        saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. The connected-
  * components machinery lives with its client in [[Dedup]] (near-dup
  * clustering); this module holds the general-purpose iterative ranks —
  * PageRank first (public method: Page et al. 1999; the MapReduce
  * formulation follows Malewicz et al.'s Pregel shape: join ranks to
  * edges, re-aggregate by destination).
  *
  * A training-data pipeline uses graph ranks for source weighting: build
  * the hyperlink (or citation / co-occurrence) graph over crawl sources
  * and up-weight documents from central nodes (the OpenWebText/WebText
  * "outbound karma" idea generalized).
  *
  * Scale shape (100 TB graph): edges and out-degrees are computed once,
  * persisted, and every iteration is ONE shuffle — join ranks (node-keyed)
  * to edges (src-keyed) then aggregate contributions by dst. Rank frames
  * are node-grain (≪ edge-grain); `localCheckpoint` every other iteration
  * caps lineage like [[Dedup.clusterPairs]]. The graph size N enters the
  * teleport term as a broadcast one-row frame — no driver-side collect
  * anywhere in the loop.
  */
object Graph {

  /** PageRank over a directed edge list (`srcCol`, `dstCol`), `iters`
    * synchronous iterations from a uniform start:
    *
    *   pr'(v) = (1−d)/N + d · Σ_{(u,v)∈E} pr(u)/outdeg(u)
    *
    * Nodes = vertices with at least one OUT edge; on the symmetric graphs
    * this engine builds (co-occurrence, similarity) that is every vertex,
    * so there is no dangling-mass term — callers feeding asymmetric link
    * graphs should symmetrize or add the dangling redistribution first.
    * Returns (node, pr) at the edge key's type, pr unnormalized double.
    *
    * The loop stays LAZY: the whole iteration chain executes as one query
    * when the caller acts on the result, with the persisted edge+degree
    * table serving every iteration and AQE broadcasting the node-grain
    * rank side from its measured runtime size. `checkpointEvery` caps
    * plan/lineage depth for long horizons — each checkpoint is a
    * materialization barrier that measured ~4× the pure iteration cost
    * on a 5-iteration run (docs/SCALING.md), so the default cadence only
    * engages past the depths where Catalyst re-optimization cost grows
    * noticeable. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
    val deg = e.groupBy("__src")
      .agg(count(lit(1)).cast("double").as("__outdeg"))
    val withDeg = e.join(deg, "__src").persist()
    val n = broadcast(withDeg.select("__src").distinct()
      .agg(count(lit(1)).cast("double").as("__n")))
    val nodes = withDeg.select(col("__src").as("node")).distinct().persist()
    var ranks = nodes.crossJoin(n)
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    (1 to iters).foreach { i =>
      val contribs = withDeg
        .join(ranks, col("__src") === col("node"))
        .groupBy(col("__dst"))
        .agg(sum(col("pr") / col("__outdeg")).as("__c"))
      ranks = nodes.join(contribs, col("node") === col("__dst"), "left")
        .crossJoin(n)
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__c"), lit(0.0))).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(eager = false)
    }
    ranks
  }
}

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
    *   pr'(v) = (1−d)/N + d · (Σ_{(u,v)∈E} pr(u)/outdeg(u) + dang/N)
    *
    * Nodes = every vertex appearing as a source OR destination; vertices
    * with no out-edges are DANGLING and their rank mass `dang` is
    * redistributed uniformly each iteration (the standard random-surfer
    * completion), so asymmetric link graphs conserve total mass ≈ 1
    * without caller-side symmetrization. The dangling term is a one-row
    * aggregate cross-joined back — never a driver collect; graphs with no
    * dangling vertex (co-occurrence, similarity — anything symmetric)
    * skip the term entirely, detected ONCE up front on the node-grain
    * frame. Returns (node, pr) at the edge key's type, pr unnormalized.
    *
    * The loop stays LAZY: the iteration chain executes when the final
    * eager checkpoint materializes it, with the persisted edge+degree
    * table serving every iteration and AQE broadcasting the node-grain
    * rank side from its measured runtime size. `checkpointEvery` caps
    * plan/lineage depth for long horizons — each mid-loop checkpoint is a
    * materialization barrier that measured ~4× the pure iteration cost
    * on a 5-iteration run (docs/SCALING.md), so the default cadence only
    * engages past the depths where Catalyst re-optimization cost grows
    * noticeable. `tol` (L1 delta per iteration) opts into an early stop —
    * that forces a materialization + one scalar aggregate per iteration,
    * the price of knowing convergence; leave None for fixed horizons.
    *
    * The returned frame is locally checkpointed (eager), so the cached
    * edge/node frames are unpersisted before returning — a long-lived
    * session accumulates nothing across repeated invocations; checkpoint
    * storage is node-grain and reclaimed by the context cleaner once the
    * result is dropped. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 8, tol: Option[Double] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // Edge prep in ONE pass, ONE exchange (r18; guide §2.4 — remove
    // shuffles outright, §1.1 — first-principles floor): the pre-r18
    // shape (`edges.distinct()`, then `deg = e.groupBy(__src)`, then
    // `e.join(deg).repartition(__src)`) planned THREE exchanges plus a
    // broadcast AND executed the caller's edge-expansion subtree twice
    // (`e` is a lazy plan referenced by both join inputs — Catalyst
    // trees share nothing across DataFrame reuse). Instead:
    //   - repartition the raw pairs by __src once;
    //   - distinct via groupBy(__src, __dst) — HashPartitioning(__src)
    //     satisfies ClusteredDistribution(__src, __dst) (equal composite
    //     keys hash to the same partition), so NO second exchange;
    //   - out-degree via count() OVER (PARTITION BY __src) on the same
    //     partitioning — replaces the groupBy+join+broadcast (and the
    //     doubled subtree) with one window whose sort is exactly the
    //     __src ordering the per-iteration sort-merge join needs anyway.
    // The cached relation then declares both the distribution and the
    // ordering, so no iteration re-shuffles or re-sorts the edge side —
    // only the node-grain rank frame moves. (r11 measured the unsorted
    // form re-sorting the edge table every iteration: 14.9 GB of sort
    // spill over 5 iterations at sf10.) Trade-off vs the old shape: the
    // window buffers one __src group at a time (spillable
    // ExternalAppendOnlyUnsafeRowArray) where the join streamed — fine
    // at out-degrees that fit a task's spill budget, which edge-grain
    // groups do; and the raw pair stream shuffles without map-side
    // dedup, which only matters for edge lists with heavy intra-
    // partition duplication. Measured at sf0.1 (isolated bench,
    // matched calibration): x_pagerank end-to-end 10.98 → 9.82 s =
    // 0.89× — smaller than the plan diff suggests because AQE's
    // exchange reuse was already deduplicating the doubled subtree at
    // runtime; the remaining win is the two dropped exchanges.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__src")
    val withDeg = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .repartition(col("__src"))
      .distinct()
      .withColumn("__outdeg", count(lit(1)).over(w).cast("double"))
      .sortWithinPartitions("__src")
      .persist()
    val nodes = withDeg.select(col("__src").as("node"))
      .union(withDeg.select(col("__dst").as("node"))).distinct().persist()
    val n = broadcast(nodes.agg(count(lit(1)).cast("double").as("__n")))
    // dangling = nodes with no out-edge; bounded node-grain anti join,
    // resolved once (isEmpty is one driver boolean, not the data)
    val dangling = nodes.join(
      withDeg.select(col("__src").as("node")).distinct(),
      Seq("node"), "left_anti").persist()
    val hasDangling = !dangling.isEmpty
    var ranks = nodes.crossJoin(n)
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    var converged = false
    (1 to iters).foreach { i =>
      if (!converged) {
        val contribs = withDeg
          .join(ranks, col("__src") === col("node"))
          .groupBy(col("__dst"))
          .agg(sum(col("pr") / col("__outdeg")).as("__c"))
        val base = nodes.join(contribs, col("node") === col("__dst"), "left")
          .crossJoin(n)
        val next =
          if (hasDangling) {
            val dang = broadcast(ranks.join(dangling, Seq("node"), "left_semi")
              .agg(coalesce(sum("pr"), lit(0.0)).as("__dang")))
            base.crossJoin(dang)
              .select(col("node"),
                (lit(1.0 - damping) / col("__n") +
                  lit(damping) * (coalesce(col("__c"), lit(0.0)) +
                    col("__dang") / col("__n"))).as("pr"))
          } else
            base.select(col("node"),
              (lit(1.0 - damping) / col("__n") +
                lit(damping) * coalesce(col("__c"), lit(0.0))).as("pr"))
        ranks = tol match {
          case Some(eps) =>
            val mat = next.localCheckpoint()
            val delta = mat.join(ranks.select(col("node"),
                col("pr").as("__prev")), "node")
              .agg(sum(abs(col("pr") - col("__prev"))).as("d"))
              .first().getDouble(0)
            if (delta < eps) converged = true
            mat
          case None if hasDangling =>
            // the dangling branch references `ranks` TWICE (contribs +
            // the dang aggregate) — left as a plain lazy plan, the
            // Catalyst tree between checkpoints would double per
            // iteration (logical plans are TREES; a shared subplan
            // appears 2^k times). A LAZY localCheckpoint solves that
            // without per-iteration blocking: the Dataset's plan becomes
            // a LogicalRDD leaf IMMEDIATELY (depth resets), while the
            // double reference lives in the RDD DAG — a real dag, where
            // the shared node is one persisted node computed once. The
            // whole horizon then executes as one job cascade at the
            // final eager checkpoint instead of iters driver-blocking
            // jobs (r15: measured below in docs/SCALING.md).
            next.localCheckpoint(eager = false)
          case None =>
            if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
              next.localCheckpoint(eager = false)
            else next
        }
      }
    }
    val out = ranks.localCheckpoint()
    withDeg.unpersist()
    nodes.unpersist()
    dangling.unpersist()
    out
  }
}

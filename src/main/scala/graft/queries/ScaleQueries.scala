package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.functions.BloomOps

/** Scale-path operators: bloom-filter join pruning, near-dup clustering
  * (connected components), and mergeable HLL distinct-count sketches —
  * the shapes that matter at 100 TB (prune before shuffling, never
  * all-pairs, pre-aggregate then merge).
  */
object ScaleQueries {

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.load(s, d, n)

  val all: Seq[Q] = Seq(

    // Bloom-filter pre-filter before the exact join (Spark's runtime
    // filter made explicit). The oracle is the PLAIN join: bloom false
    // positives are removed by the exact join, so results are identical —
    // which is exactly the property worth verifying.
    Q("j_bloom_prune",
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val hv = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
      BloomOps.prefilter(t(s, d, "lineitem"), "l_orderkey", hv, "o_orderkey",
        expectedItems = 100000L)
        .join(hv, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          Fp.moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // Near-dup clusters: LSH candidate pairs → connected components →
    // dedup groups (A~B, B~C land in one cluster even though (A,C) never
    // surfaced as a pair). Rows-only: min-label propagation to a fixed
    // point is iterative and not single-statement SQL; determinism comes
    // from md5-derived signatures and min-id labels.
    Q.rowsOnly("x_dedup_clusters") { (s, d) =>
      val pairs = Dedup.nearDupPairs(
        t(s, d, "documents"), "text", "doc_id").filter(col("jaccard") >= 0.8)
      Dedup.clusterPairs(pairs)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"), max("id").as("max_doc"))
        .orderBy("cluster_id")
    },

    // Mergeable distinct-count sketches (HLL): per-year customer sketches
    // estimated directly AND unioned into an all-time estimate WITHOUT
    // rescanning — at scale the per-partition sketches are tiny and the
    // union replaces a global countDistinct shuffle. Rows-only: estimates
    // are deterministic (register-max is order-independent) but DuckDB's
    // HLL implementation differs.
    Q.rowsOnly("a_hll_distinct") { (s, d) =>
      val perYear = t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val yearly = perYear.select(col("y").cast("string").as("period"),
        hll_sketch_estimate(col("sk")).as("approx_customers"))
      val overall = perYear.agg(hll_union_agg(col("sk")).as("sk"))
        .select(lit("ALL").as("period"),
          hll_sketch_estimate(col("sk")).as("approx_customers"))
      yearly.unionByName(overall).orderBy("period")
    },
  )
}

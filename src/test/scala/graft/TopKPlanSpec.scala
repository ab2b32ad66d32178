package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap top-k-per-key strategy: plan rewrite fires on the
  * row_number pattern, results are identical to Spark's sort-based window
  * path, and non-matching shapes are left alone. */
class TopKPlanSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("a", 5, 1.0), ("a", 3, 2.0), ("a", 9, 3.0), ("a", 1, 4.0),
    ("b", 7, 5.0), ("b", 2, 6.0),
    ("c", 4, 7.0))
    .toDF("k", "v", "payload")

  private def planOf(df: DataFrame): String = finalPlanOf(df)

  private def withRewrite[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.topkRewrite.enabled", on.toString)
    try body finally
      spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  private def topk(df: DataFrame, k: Int, desc: Boolean = false) = {
    val w = Window.partitionBy("k")
      .orderBy(if (desc) col("v").desc else col("v").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("rewrite fires and matches the window path, asc and desc") {
    for (desc <- Seq(false, true)) {
      val fast = topk(events, 2, desc)
      val got = fast.orderBy("k", "rn").as[(String, Int, Double, Int)].collect()
      assert(planOf(fast).contains("TopKPerKey"), "strategy did not fire")
      val expected = withRewrite(false) {
        val slow = topk(events, 2, desc)
        val rows = slow.orderBy("k", "rn").as[(String, Int, Double, Int)].collect()
        assert(!planOf(slow).contains("TopKPerKey"), "flag did not disable")
        rows
      }
      assert(got === expected)
    }
  }

  test("rn = 1 form (latest-per-key) rewrites and ranks correctly") {
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    val df = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val got = df.select("k", "v").orderBy("k").as[(String, Int)].collect()
    assert(planOf(df).contains("TopKPerKey"))
    assert(got === Array(("a", 9), ("b", 7), ("c", 4)))
  }

  test("k larger than every group emits all rows with dense ranks") {
    val df = topk(events, 10)
    val got = df.orderBy("k", "rn")
      .select("k", "rn").as[(String, Int)].collect()
    assert(planOf(df).contains("TopKPerKey"))
    assert(got === Array(("a", 1), ("a", 2), ("a", 3), ("a", 4),
      ("b", 1), ("b", 2), ("c", 1)))
  }

  test("mixed predicates and rank functions keep Spark's plan") {
    val w = Window.partitionBy("k").orderBy("v")
    val mixed = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("payload") > 1.0)
    assert(!planOf(mixed).contains("TopKPerKey"))
    val ranked = events.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 2)
    assert(!planOf(ranked).contains("TopKPerKey"))
    // both still return correct results through Spark's own operators
    assert(mixed.count() === 5 && ranked.count() === 5)
  }

  test("survives a pre-partitioned child without an extra exchange") {
    val pre = events.repartition(col("k"))
    val df = topk(pre, 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    // the final top-k must reuse the repartition exchange, not add its own:
    // exactly ONE shuffle in the final plan (the AQE string repeats the
    // initial plan below — count only the final section)
    val finalSection = plan.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalSection).size <= 1,
      plan)
  }

  test("property: random data, random k — operator ≡ window path") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200 + rng.nextInt(300)
      val data = (1 to n).map { _ =>
        (s"k${rng.nextInt(12)}", rng.nextInt(1000), rng.nextLong())
      }
      // unique total order: (v, uid) — ties in v resolved deterministically
      val df = data.toDF("k", "v", "uid")
      val k = 1 + rng.nextInt(8)
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("uid"))
      def run = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .orderBy("k", "rn").as[(String, Int, Long, Int)].collect().toSeq
      val fast = run
      assert(planOf(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)).contains("TopKPerKey"))
      val slow = withRewrite(false)(run)
      assert(fast == slow, s"trial $trial (n=$n, k=$k) diverged")
    }
  }

  test("commuted and BETWEEN spellings rewrite too") {
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    def ranked = events.withColumn("rn", row_number().over(w))
    // 1 = rn (commuted equality)
    val eq = ranked.filter(lit(1) === col("rn"))
    assert(planOf(eq).contains("TopKPerKey"), "EqualTo(1, rn) did not fire")
    assert(eq.select("k", "v").orderBy("k").as[(String, Int)].collect()
      === Array(("a", 9), ("b", 7), ("c", 4)))
    // k >= rn (commuted upper bound)
    val ge = ranked.filter(lit(2) >= col("rn"))
    assert(planOf(ge).contains("TopKPerKey"), "GreaterThanOrEqual(2, rn) did not fire")
    // rn BETWEEN 1 AND 2 — the >= 1 conjunct is a tautology, not a blocker
    val btw = ranked.filter(col("rn").between(1, 2))
    assert(planOf(btw).contains("TopKPerKey"), "BETWEEN 1 AND k did not fire")
    val expected = withRewrite(false) {
      ranked.filter(col("rn") <= 2).orderBy("k", "rn")
        .as[(String, Int, Double, Int)].collect()
    }
    assert(ge.orderBy("k", "rn").as[(String, Int, Double, Int)].collect()
      === expected)
    assert(btw.orderBy("k", "rn").as[(String, Int, Double, Int)].collect()
      === expected)
    // a REAL lower bound is not expressible by the operator: falls back
    val lower = ranked.filter(col("rn").between(2, 3))
    assert(!planOf(lower).contains("TopKPerKey"))
    assert(lower.select("k", "v").orderBy("k", "v").as[(String, Int)].collect()
      === Array(("a", 3), ("a", 5), ("b", 2)))
  }

  test("maxKeys guard: partial flush + final sort fallback stay exact") {
    val n = 5000
    val many = (0 until n).map(i => (i % 997, i, i.toLong)).toDF("k", "v", "uid")
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("uid"))
    def run = many.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("k", "rn").as[(Int, Int, Long, Int)].collect().toSeq
    val expected = withRewrite(false)(run)
    // force both fallbacks: every task's key map overflows at 16 keys
    spark.conf.set("spark.graft.topkRewrite.maxKeys", "16")
    try {
      val df = many.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      assert(planOf(df).contains("TopKPerKey"))
      assert(run == expected, "fallback paths diverged from the window path")
    } finally spark.conf.unset("spark.graft.topkRewrite.maxKeys")
  }

  test("final mode declares its output ordering: downstream sort elided") {
    val df = topk(events, 2)
    val sorted = df.sortWithinPartitions("k", "rn")
    sorted.collect()
    val plan = sorted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the declared outputOrdering (keys ASC, rn ASC, order) must satisfy
    // the per-partition sort, so RemoveRedundantSorts drops the SortExec
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort ["), s"expected no sort in:\n$plan")
    // and the emitted order really is (k, rn) within each partition
    val parts = sorted.select("k", "rn").as[(String, Int)]
      .mapPartitions(it => Iterator.single(it.toSeq)).collect()
    parts.foreach(p => assert(p == p.sorted, s"partition not key-ordered: $p"))
  }

  test("Bm25.scoreBatch's per-query top-k routes through TopKPerKeyExec " +
      "and the partial mode caps a hot term's exchange volume") {
    // hot-term fixture: "hot" appears in HALF the corpus — the skew case
    // the per-query top-k partition would otherwise absorb whole
    val docs = (1L to 2000L).map { i =>
      val body = s"filler$i alpha beta gamma"
      (i, if (i % 2 == 0) s"hot $body" else body)
    }.toDF("doc_id", "text")
    val queries = Seq((1, "hot"), (2, "alpha")).toDF("query_id", "term")
    val scored = graft.ext.Bm25.scoreBatch(
      docs, "text", "doc_id", queries, topK = 5)
    val rows = scored.collect()
    assert(rows.count(_.getInt(0) == 1) === 5, "hot query must emit top-5")

    // 1. the row_number <= k filter was rewritten: partial AND final
    //    bounded-heap operators execute (no sort-based window path)
    val plan = planOf(scored)
    assert(plan.contains("TopKPerKey k=5, partial"), plan)
    assert(plan.contains("TopKPerKey k=5, final"), plan)
    assert(!plan.contains("Window ["), s"window survived:\n$plan")

    // 2. skew defense, measured: the partial heap bounds what crosses
    //    the exchange to <= k rows per (query, task) — the 1000-doc hot
    //    query contributes at most k x map-tasks rows, never its full
    //    pair volume
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def collectTopK(p: SparkPlan): Seq[graft.plans.TopKPerKeyExec] = p match {
      case a: AdaptiveSparkPlanExec => collectTopK(a.executedPlan)
      case q: QueryStageExec => collectTopK(q.plan)
      case t: graft.plans.TopKPerKeyExec =>
        t +: t.children.flatMap(collectTopK)
      case other => other.children.flatMap(collectTopK)
    }
    val nodes = collectTopK(scored.queryExecution.executedPlan)
    assert(nodes.size === 2, s"expected partial+final, got ${nodes.size}")
    val partial = nodes.find(_.rnAttr.isEmpty).get
    val mapTasks = partial.child.outputPartitioning.numPartitions
    val partialOut = partial.metrics("numOutputRows").value
    val pairRows = 1000L + 2000L // hot hits + alpha hits
    assert(partialOut <= 5L * mapTasks * 2,
      s"partial emitted $partialOut rows for $mapTasks tasks")
    assert(partialOut < pairRows / 10,
      s"exchange not bounded: $partialOut of $pairRows pair rows crossed")
  }

  test("multi-column keys and order tiebreakers match the window path") {
    val df = Seq(("x", 1, 10, "p"), ("x", 1, 10, "q"), ("x", 2, 5, "r"),
      ("y", 1, 10, "s"))
      .toDF("k1", "k2", "v", "tag")
    val w = Window.partitionBy("k1", "k2").orderBy(col("v").desc, col("tag"))
    def run = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select("k1", "k2", "tag").orderBy("k1", "k2")
      .as[(String, Int, String)].collect()
    val fast = run
    val slow = withRewrite(false)(run)
    assert(fast === slow)
    assert(fast === Array(("x", 1, "p"), ("x", 2, "r"), ("y", 1, "s")))
  }
}

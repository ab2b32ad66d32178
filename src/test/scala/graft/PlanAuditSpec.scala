package graft

/** Guards the physical-plan claims documented in docs/PLANS.md: if a
  * refactor silently drops a pushdown, a broadcast, or the top-k rewrite,
  * these fail before any benchmark would notice. Plans are taken from the
  * ACTUAL registered queries (SparkEntry), not re-built lookalikes. */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): String =
    finalPlanOf(SparkEntry.queries(name)(spark, sf001))

  private def formattedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("p_filter_pushdown: predicate and projection reach the parquet scan") {
    val p = planOf("p_filter_pushdown")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_quantity,30.0)"), p.take(2000))
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      "scan must not read unprojected columns")
  }

  test("s_scan_project: scan reads only the two projected columns") {
    val p = formattedPlan("s_scan_project")
    assert(p.contains("struct<r_regionkey:int,r_name:string>"),
      p.take(2000))
  }

  test("j_star_join: fixed dims broadcast, no dim sort-merge") {
    val p = planOf("j_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("j_snowflake_revenue: date range pushed into the orders scan") {
    val p = planOf("j_snowflake_revenue")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"), p.take(2000))
  }

  test("w_latest_per_key rides the bounded-heap top-k operator") {
    val p = planOf("w_latest_per_key")
    assert(p.contains("TopKPerKey"), p.take(2000))
    assert(!p.contains("WindowGroupLimit"),
      "rewrite should replace Spark's sort-based group-limit path")
  }

  test("j_dpp_prune: scan carries a dynamic pruning filter, reads < all partitions") {
    val df = SparkEntry.queries("j_dpp_prune")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in:\n${plan.take(3000)}")
    // the partitioned fact scan must have read fewer year-partitions than
    // the table holds (runtime metric, not a plan-string claim)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps finished stages in leaf QueryStageExec nodes: descend
    // explicitly or collect() never reaches the scans
    def leaves(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case q: QueryStageExec => leaves(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(leaves)
    }
    val scans = leaves(df.queryExecution.executedPlan)
      .filter(_.schema.fieldNames.contains("o_totalprice"))
      .filter(_.metrics.contains("numPartitions"))
    assert(scans.nonEmpty, s"no partitioned scan found in:\n${plan.take(3000)}")
    val totalYears = queries.ScaleQueries.partitionedOrders(spark, sf001)
      .select("annee").distinct().count()
    val read = scans.map(_.metrics("numPartitions").value).min
    assert(read > 0 && read < totalYears,
      s"expected a pruned read, got $read of $totalYears partitions")
  }
}

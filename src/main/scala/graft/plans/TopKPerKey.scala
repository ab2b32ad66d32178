package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator replacement for the `row_number() <= k` top-k-per-key
  * pattern — the latest-version-per-key / top-k-neighbors shape that
  * appears all over warehouse workloads (SURVEY W1/O1; reference
  * `load_dimensions.py:183-187`).
  *
  * Spark's own plan for `Filter(rn <= k, Window(row_number))` is
  * exchange → full SORT of every partition → window → filter; since 3.5
  * the `WindowGroupLimit` optimization prunes rows per group but the sort
  * still dominates: O(n log n) comparisons and the whole partition
  * buffered (and spilled) by the sorter. This operator keeps a bounded
  * HEAP of k rows per key instead: O(n log k) comparisons, memory
  * proportional to the OUTPUT (keys × k), never the input, and no spill
  * machinery engaged at all. At 100 TB latest-per-key (k=1, billions of
  * keys) that is the difference between sorting the fact table and one
  * hash-map pass over it.
  *
  * Physical shape mirrors partial aggregation: a map-side partial top-k
  * per (task, key) bounds the exchange to ≤k rows per key per task, then
  * the final top-k runs on the clustered side and emits the rank column.
  * Registered via `SparkSessionExtensions.injectPlannerStrategy`
  * (GraftExtensions); `spark.graft.topkRewrite.enabled=false` disables it
  * per session. Only exact `row_number` + `rn <= k` / `rn = 1` shapes are
  * rewritten (rank/dense_rank admit ties past k and keep Spark's plan).
  */
case class TopKPerKeyStrategy(session: SparkSession)
    extends SparkStrategy with PredicateHelper {

  private def enabled: Boolean =
    session.conf.get("spark.graft.topkRewrite.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case logical.Filter(cond, w: logical.Window) if enabled =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
                UnboundedPreceding, CurrentRow))), _)) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val limits = conjuncts.flatMap(rankLimit(_, alias.exprId))
          if (limits.size != conjuncts.size || limits.isEmpty || limits.min <= 0)
            Nil // unrelated predicates present, or degenerate limit
          else {
            // Spark's own InferWindowGroupLimit may already have inserted a
            // logical WindowGroupLimit below the Window — redundant under
            // this operator, so plan from its child.
            val src = w.child match {
              case g: logical.WindowGroupLimit => g.child
              case c => c
            }
            val k = limits.min.toInt // <= Int literal bounds by construction
            val partial = TopKPerKeyExec(k, w.partitionSpec, w.orderSpec,
              None, planLater(src))
            TopKPerKeyExec(k, w.partitionSpec, w.orderSpec,
              Some(alias.toAttribute), partial) :: Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }

  /** The filter forms that bound row_number from above. The strict forms
    * compute `v - 1` in Long: at `v = Int.MinValue` the Int subtraction
    * would wrap to Int.MaxValue, turning an always-false filter into
    * "keep everything". A wrapped/degenerate bound falls through to the
    * `limits.min <= 0` guard and keeps Spark's plan. */
  private def rankLimit(e: Expression, rnId: ExprId): Option[Long] = e match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId => Some(v.toLong)
    case LessThan(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId => Some(v.toLong - 1)
    case EqualTo(a: AttributeReference, Literal(1, _))
        if a.exprId == rnId => Some(1L)
    case GreaterThanOrEqual(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId => Some(v.toLong)
    case GreaterThan(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId => Some(v.toLong - 1)
    case _ => None
  }
}

/** Bounded-heap top-k rows per key.
  *
  * `rnAttr = None` is the PARTIAL mode: runs on whatever partitioning the
  * child has (no required distribution — like a partial aggregate), keeps
  * ≤k rows per key per task, emits no rank. `rnAttr = Some(_)` is the
  * FINAL mode: requires clustering on the keys (EnsureRequirements adds
  * the exchange), emits each key's rows in rank order with the rank
  * column appended under the original alias' exprId so downstream
  * references resolve unchanged.
  */
case class TopKPerKeyExec(
    k: Int,
    partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rnAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  import org.apache.spark.sql.execution.metric.SQLMetrics

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "groups"))

  override def output: Seq[Attribute] = child.output ++ rnAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (rnAttr.isEmpty) UnspecifiedDistribution :: Nil
    else if (partExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = partExprs
    val order = orderSpec
    val limit = k
    val emitRank = rnAttr.isDefined
    val outAttrs = output
    val rowsMetric = longMetric("numOutputRows")
    val groupsMetric = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // rows may arrive as any InternalRow; buffered + emitted rows must be
      // UnsafeRow (the exchange above the partial serializes UnsafeRows)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ordering = GenerateOrdering.generate(
        order.map(BindReferences.bindReference(_, childOutput)))
      // max-heap on the kept side: head = WORST kept row; a new row enters
      // iff it beats the worst (strictly — equal rows keep the incumbent,
      // matching row_number's first-seen tie behavior within this task)
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      val reverse: java.util.Comparator[InternalRow] = ordering.reverse
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity bounded by a small constant: a defensive
          // huge k must not preallocate k slots per key — the heap grows
          // on demand, so memory tracks ACTUAL group sizes
          heap = new java.util.PriorityQueue[UnsafeRow](
            math.max(1, math.min(limit, 16)), reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(toUnsafe(row).copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(toUnsafe(row).copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rnRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._
      groupsMetric += heaps.size()
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = new Array[UnsafeRow](heap.size)
        var i = rows.length - 1
        // draining the max-heap yields worst-first: fill back-to-front
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
        rowsMetric += rows.length
        if (!emitRank) rows.iterator
        else rows.iterator.zipWithIndex.map { case (r, idx) =>
          rnRow.setInt(0, idx + 1)
          outProj(joined(r, rnRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override def simpleString(maxFields: Int): String =
    s"TopKPerKey k=$k, ${if (rnAttr.isDefined) "final" else "partial"}, " +
      s"keys=${partExprs.take(maxFields).mkString("[", ", ", "]")}"
}

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
import org.apache.spark.sql.types.{StructField, StructType}

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
  * "Proportional to the output" can still exceed executor memory when one
  * partition holds an extreme number of DISTINCT keys, so the heap map is
  * guarded by `spark.graft.topkRewrite.maxKeys` (default 1M keys per
  * task). Past the guard the PARTIAL mode flushes its buffer downstream
  * and starts a fresh map (exactly a partial aggregate's fallback — more
  * exchange rows, same answer), and the FINAL mode abandons the map for a
  * spillable external sort on (keys, order) followed by a streaming
  * group walk — the memory behavior of Spark's own plan, engaged only
  * when the data actually needs it.
  *
  * Physical shape mirrors partial aggregation: a map-side partial top-k
  * per (task, key) bounds the exchange to ≤k rows per key per task, then
  * the final top-k runs on the clustered side and emits the rank column.
  * The final mode emits key groups in key order (the group list is sorted
  * before emission — #groups comparisons, never rows) and DECLARES
  * `outputOrdering = keys ASC, rn ASC, orderSpec`, so a downstream
  * `orderBy(key, rn)`-shaped sort or sort-merge join over the keys elides
  * its own sort.
  *
  * Registered via `SparkSessionExtensions.injectPlannerStrategy`
  * (GraftExtensions); `spark.graft.topkRewrite.enabled=false` disables it
  * per session. Only exact `row_number` bounded-above shapes are
  * rewritten — `rn <= k`, `rn < k`, `rn = 1` and their commuted
  * spellings, plus tautological lower-bound conjuncts (`rn >= 1`,
  * so `rn BETWEEN 1 AND k` qualifies). rank/dense_rank admit ties past k
  * and keep Spark's plan.
  */
case class TopKPerKeyStrategy(session: SparkSession)
    extends SparkStrategy with PredicateHelper {

  private def enabled: Boolean =
    session.conf.get("spark.graft.topkRewrite.enabled", "true") == "true"

  private def maxKeys: Long =
    session.conf.get("spark.graft.topkRewrite.maxKeys", "1000000").toLong

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case logical.Filter(cond, w: logical.Window) if enabled =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
                UnboundedPreceding, CurrentRow))), _))
            if w.partitionSpec.forall(e => RowOrdering.isOrderable(e.dataType)) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val bounds = conjuncts.flatMap(rankBound(_, alias.exprId))
          val limits = bounds.collect { case RankLimit(v) => v }
          if (bounds.size != conjuncts.size || limits.isEmpty || limits.min <= 0)
            Nil // unrelated predicates present, or no/degenerate upper bound
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
              None, maxKeys, planLater(src))
            TopKPerKeyExec(k, w.partitionSpec, w.orderSpec,
              Some(alias.toAttribute), maxKeys, partial) :: Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }

  private sealed trait Bound
  private case class RankLimit(v: Long) extends Bound
  /** A conjunct that is always true for row_number output (rn >= 1): it
    * constrains nothing, so it must not disqualify the rewrite — this is
    * how `rn BETWEEN 1 AND k` matches. */
  private case object Tautology extends Bound

  /** The filter forms that bound row_number. The strict forms compute
    * `v - 1` in Long: at `v = Int.MinValue` the Int subtraction would wrap
    * to Int.MaxValue, turning an always-false filter into "keep
    * everything". A wrapped/degenerate bound falls through to the
    * `limits.min <= 0` guard and keeps Spark's plan. Lower bounds looser
    * than rn's own minimum (`rn >= v` / `v <= rn` with v <= 1) are
    * tautologies; a REAL lower bound (`rn >= 2`) is not expressible by
    * this operator and falls back. */
  private def rankBound(e: Expression, rnId: ExprId): Option[Bound] = e match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId => Some(RankLimit(v.toLong))
    case LessThan(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId => Some(RankLimit(v.toLong - 1))
    case EqualTo(a: AttributeReference, Literal(1, _))
        if a.exprId == rnId => Some(RankLimit(1L))
    case EqualTo(Literal(1, _), a: AttributeReference)
        if a.exprId == rnId => Some(RankLimit(1L))
    case GreaterThanOrEqual(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId => Some(RankLimit(v.toLong))
    case GreaterThan(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId => Some(RankLimit(v.toLong - 1))
    case GreaterThanOrEqual(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId && v <= 1 => Some(Tautology)
    case GreaterThan(a: AttributeReference, Literal(v: Int, _))
        if a.exprId == rnId && v <= 0 => Some(Tautology)
    case LessThanOrEqual(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId && v <= 1 => Some(Tautology)
    case LessThan(Literal(v: Int, _), a: AttributeReference)
        if a.exprId == rnId && v <= 0 => Some(Tautology)
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
  *
  * `maxKeys` bounds the in-memory map (see the strategy scaladoc):
  * partial flushes past it, final falls back to a spillable external
  * sort. Both fallbacks preserve the exact result.
  */
case class TopKPerKeyExec(
    k: Int,
    partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rnAttr: Option[Attribute],
    maxKeys: Long,
    child: SparkPlan) extends UnaryExecNode {

  import org.apache.spark.sql.execution.metric.SQLMetrics

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "groups"),
    "numFallbacks" -> SQLMetrics.createMetric(sparkContext,
      "maxKeys flushes/sort fallbacks"))

  override def output: Seq[Attribute] = child.output ++ rnAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (rnAttr.isEmpty) UnspecifiedDistribution :: Nil
    else if (partExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  /** FINAL mode emits key groups in key-ascending order and rows in rank
    * order within each group, so the output is totally ordered by
    * (keys ASC, rn ASC) — and within one (key, rn) there is exactly one
    * row, so appending orderSpec is vacuously true and lets a downstream
    * sort on (keys, orderCols) elide too. */
  override def outputOrdering: Seq[SortOrder] =
    if (rnAttr.isEmpty) Nil
    else partExprs.map(SortOrder(_, Ascending)) ++
      rnAttr.map(SortOrder(_, Ascending)) ++ orderSpec

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = partExprs
    val order = orderSpec
    val limit = k
    val emitRank = rnAttr.isDefined
    val keyCap = maxKeys
    val outAttrs = output
    val rowsMetric = longMetric("numOutputRows")
    val groupsMetric = longMetric("numGroups")
    val fallbackMetric = longMetric("numFallbacks")
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

      def insertWith(row: InternalRow, key: UnsafeRow,
          heap0: java.util.PriorityQueue[UnsafeRow]): Unit = {
        var heap = heap0
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

      // The row that tripped the cap: consumed from `iter` but not yet
      // buffered — it MUST be the first row processed after the flush.
      var pending: UnsafeRow = null

      // Consume input into the heap map until it's exhausted or the map
      // crosses keyCap; returns true when input remains (cap was hit).
      def fill(): Boolean = {
        if (pending != null) {
          val key = keyProj(pending)
          insertWith(pending, key, heaps.get(key))
          pending = null
        }
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          val heap = heaps.get(key)
          if (heap == null && heaps.size() >= keyCap) {
            pending = toUnsafe(row).copy()
            return true
          }
          insertWith(row, key, heap)
        }
        false
      }

      import scala.jdk.CollectionConverters._

      def drainHeap(heap: java.util.PriorityQueue[UnsafeRow]): Array[UnsafeRow] = {
        val rows = new Array[UnsafeRow](heap.size)
        var i = rows.length - 1
        // draining the max-heap yields worst-first: fill back-to-front
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
        rows
      }

      if (!emitRank) {
        // PARTIAL: flush-and-reset past the cap, like a partial aggregate
        // falling back — downstream final top-k merges the flushes.
        def flush(): Iterator[UnsafeRow] = {
          val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
          heaps.values().iterator().asScala.foreach { h =>
            val rows = drainHeap(h)
            rowsMetric += rows.length
            out ++= rows
          }
          groupsMetric += heaps.size()
          heaps.clear()
          out.iterator
        }
        new Iterator[Iterator[UnsafeRow]] {
          private var done = false
          override def hasNext: Boolean = !done
          override def next(): Iterator[UnsafeRow] = {
            val more = fill()
            if (more) fallbackMetric += 1 else done = true
            flush()
          }
        }.flatten
      } else {
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val rnRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val keySchema = keyExprs.zipWithIndex.map { case (e, i) =>
          SortOrder(BoundReference(i, e.dataType, e.nullable), Ascending)
        }
        val keyOrdering = GenerateOrdering.generate(keySchema)
        val capHit = fill()
        if (!capHit) {
          // in-memory path: emit groups in key order (sorts #groups keys,
          // never rows) so the declared outputOrdering holds
          groupsMetric += heaps.size()
          val keys = heaps.keySet().toArray(new Array[UnsafeRow](heaps.size()))
          java.util.Arrays.sort(keys,
            keyOrdering.asInstanceOf[java.util.Comparator[InternalRow]])
          keys.iterator.flatMap { key =>
            val rows = drainHeap(heaps.get(key))
            rowsMetric += rows.length
            rows.iterator.zipWithIndex.map { case (r, idx) =>
              rnRow.setInt(0, idx + 1)
              outProj(joined(r, rnRow))
            }
          }
        } else {
          // FALLBACK: too many distinct keys for the map — spillable
          // external sort on (keys, order) + streaming group walk, the
          // memory behavior of Spark's own window plan.
          fallbackMetric += 1
          val sorter = org.apache.spark.sql.execution.UnsafeExternalRowSorter
            .create(
              StructType(childOutput.map(a =>
                StructField(a.name, a.dataType, a.nullable))),
              GenerateOrdering.generate((keyExprs.map(SortOrder(_, Ascending))
                ++ order).map(BindReferences.bindReference(_, childOutput))),
              org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
              new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer {
                private val zero =
                  new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer.Prefix
                override def computePrefix(row: InternalRow) = zero
              },
              4L * 1024 * 1024,
              false)
          heaps.values().iterator().asScala.foreach { h =>
            drainHeap(h).foreach(sorter.insertRow)
          }
          heaps.clear()
          if (pending != null) { sorter.insertRow(pending); pending = null }
          while (iter.hasNext) sorter.insertRow(toUnsafe(iter.next()))
          var curKey: UnsafeRow = null
          var rank = 0
          sorter.sort().flatMap { row =>
            val key = keyProj(row)
            if (curKey == null || key != curKey) {
              curKey = key.copy(); rank = 1; groupsMetric += 1
            } else rank += 1
            if (rank <= limit) {
              rowsMetric += 1
              rnRow.setInt(0, rank)
              Some(outProj(joined(row, rnRow)))
            } else None
          }
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

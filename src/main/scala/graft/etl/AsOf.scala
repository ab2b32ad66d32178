package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks (SURVEY §2.3 "not present:
  * range/as-of") but any event-warehouse needs at scale.
  *
  * Both avoid the naive theta-join (`l.key = r.key AND r.ts <= l.ts`),
  * which Spark can only execute as a broadcast-nested-loop or a per-key
  * cross product — O(|L|·|R|) per key, hopeless at 100 TB:
  *
  *   - [[asofJoin]] is ONE shuffle: union both sides, then a single
  *     partitionBy(key).orderBy(ts) window carries the latest right-side
  *     payload forward onto each left row (`last(_, ignoreNulls)`).
  *     Cost O((|L|+|R|) log) via the shuffle sort, skew-safe under AQE.
  *   - [[bandedRangeJoin]] turns a bounded-interval predicate into an
  *     equi-join on (key, time-bucket): the right side is replicated to
  *     the (at most 2) buckets it can match, joined hash-for-hash, then
  *     the exact predicate filters residuals. Replication factor is
  *     constant (2), independent of data volume.
  */
object AsOf {

  /** For each left row: the single right row nearest in time on the
    * requested side — `backward` (default) takes the greatest `ts` with
    * `right.ts <= left.ts`, `forward` the smallest `ts` with
    * `right.ts >= left.ts` — keys matching, left join semantics
    * (unmatched left rows keep null payloads). Among right rows with
    * equal `ts`, the GREATEST `tiebreak` wins in both directions (it
    * sorts nearest the left row in the window). Right rows with a null
    * `ts` never match (merge_asof semantics); left rows with a null `ts`
    * get null payloads.
    *
    * @param payload right-side columns to carry onto the left rows
    * @param tiebreak right-side column ordering rows with equal `ts`
    *                 (pass a unique id for deterministic output)
    * @param direction "backward" | "forward"
    * @param tolerance max |left.ts - right.ts| as an interval column
    *                  (e.g. `expr("INTERVAL 1 HOUR")`); matches farther
    *                  away yield null payloads, as in pandas merge_asof
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tiebreak: String,
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"asofJoin: unknown direction '$direction'")
    val leftCols = left.columns.toSeq
    // each side's columns travel as ONE struct through the union, so all
    // payload fields provably come from the SAME right row and no join-back
    // (with its second scan + shuffle) is needed afterwards
    // null-ts right rows would sort first (asc nulls-first) and be carried
    // as the "latest" match for left rows with no true predecessor —
    // brute-force asof (r.ts <= l.ts) excludes them, so drop them here too
    val rightNonNull = right.filter(col(ts).isNotNull)
    val rstruct = struct(
      (Seq(ts, tiebreak) ++ payload).distinct.map(rightNonNull(_)): _*)
    val r = rightNonNull.select(col(key), col(ts), lit(0).as("__side"),
      rstruct.as("__r"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*))
        .schema.head.dataType).as("__l"))
    val l = left.select(col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(r.schema("__r").dataType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))
    // at equal ts, right (__side=0) sorts before left so ties match; for
    // `forward` the time axis is walked in reverse, turning the same
    // carry-last-right-forward window into carry-next-right-backward.
    // Among equal right ts the greatest tiebreak lands nearest the left row.
    val tsOrd = if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(key)
      .orderBy(tsOrd, col("__side").asc, col(s"__r.$tiebreak").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(tol) if direction == "backward" =>
        col(s"__m.$ts") >= col(ts) - tol
      case Some(tol) => col(s"__m.$ts") <= col(ts) + tol
    }
    // left rows with a null ts have no defined "nearest" row: null payloads
    val matched = col(ts).isNotNull && withinTol
    l.unionByName(r)
      .withColumn("__m", last("__r", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p =>
          when(matched, col(s"__m.$p")).otherwise(lit(null)).as(p)): _*)
  }

  /** Equi-banded bounded range join: rows `(l, r)` with matching `key` and
    * `r.ts` in the half-open interval `(l.ts, l.ts + width]`.
    * Returns the joined frame (inner); aggregate downstream as needed.
    *
    * @param width interval length as a Spark SQL interval expression
    *              column, e.g. `expr("INTERVAL 1 HOUR")`
    * @param bucketSeconds band size in seconds; MUST be >= the interval
    *                      width in seconds so each right row lands in at
    *                      most two candidate bands. Enforced when `width`
    *                      is a literal interval (the common case); a
    *                      non-literal width that exceeds the band size
    *                      SILENTLY DROPS matches beyond the b-1 band —
    *                      callers passing computed widths must size
    *                      `bucketSeconds` to the maximum possible width
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, width: Column, bucketSeconds: Long): DataFrame = {
    // Inspect the width on the driver — analysis + constant folding only,
    // NO Spark job at plan-construction time. A constant interval (the
    // common case) folds to a literal whose length bounds in seconds;
    // anything non-constant skips the guard (the scaladoc hazard above
    // applies).
    widthUpperBoundSeconds(left.sparkSession, width).foreach(ws => require(
      bucketSeconds >= ws,
      s"bandedRangeJoin: bucketSeconds=$bucketSeconds is smaller than the " +
        s"interval width (${ws}s) — rows beyond the adjacent band would be " +
        "silently dropped; pass bucketSeconds >= the width in seconds"))
    def bucket(c: Column): Column =
      floor(unix_timestamp(c) / lit(bucketSeconds))
    val l = left.withColumn("__band", bucket(col(ts)))
    // a right row in band b can only match left rows in bands {b-1, b}
    val r = right.columns.foldLeft(right)((df, c) =>
        df.withColumnRenamed(c, s"r_$c"))
      .withColumn("__band",
        explode(array(bucket(col(s"r_$ts")) - 1, bucket(col(s"r_$ts")))))
    l.join(r,
      l(key) === r(s"r_$key") && l("__band") === r("__band") &&
        r(s"r_$ts") > l(ts) && r(s"r_$ts") <= l(ts) + width)
      .drop("__band")
  }

  /** Upper bound (seconds) of a CONSTANT interval column, obtained on the
    * driver by analyzing + constant-folding `width` against a one-row
    * relation — never by running a job. `None` when the width isn't a
    * constant interval (e.g. it references data columns — then either
    * analysis fails, and ONLY `AnalysisException` is swallowed, or the
    * expression folds only PARTIALLY and is rejected because the bound
    * is taken solely from a fully-folded top-level literal). Year-month components are bounded by 31-day months —
    * conservative for the bucketSeconds guard (may reject a borderline
    * config, never silently passes an undersized one). */
  private[graft] def widthUpperBoundSeconds(
      spark: org.apache.spark.sql.SparkSession,
      width: Column): Option[Double] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
    import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, YearMonthIntervalType}
    import org.apache.spark.unsafe.types.CalendarInterval
    def litSeconds(l: Literal): Option[Double] = l match {
      case Literal(iv: CalendarInterval, CalendarIntervalType) =>
        Some(iv.months * 31.0 * 86400 + iv.days * 86400.0 +
          iv.microseconds / 1e6)
      case Literal(micros: Long, _: DayTimeIntervalType) =>
        Some(micros / 1e6)
      case Literal(months: Int, _: YearMonthIntervalType) =>
        Some(months * 31.0 * 86400)
      case _ => None
    }
    try {
      // Only a FULLY folded width counts: the projected expression itself
      // must be a Literal (or the whole plan collapsed to a local row).
      // Scanning the tree for ANY literal would let a partially folded
      // width (one that resolved against range(1)'s `id`) smuggle an
      // inner sub-literal out as the bound and defeat the guard.
      spark.range(1).select(width.as("__w"))
        .queryExecution.optimizedPlan match {
        case Project(Seq(Alias(l: Literal, _)), _) => litSeconds(l)
        case Project(Seq(l: Literal), _) => litSeconds(l)
        case lr: LocalRelation if lr.output.size == 1 && lr.data.size == 1 =>
          val dt = lr.output.head.dataType
          litSeconds(Literal(lr.data.head.get(0, dt), dt))
        case _ => None
      }
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }
  }
}

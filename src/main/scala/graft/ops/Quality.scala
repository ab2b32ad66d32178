package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declarative data-quality expectations — the warehouse "quality gate"
  * pattern (the reference's load steps assert orphan keys and null
  * business keys imperatively; this is the same contract as one
  * reusable, composable operator set).
  *
  * Scale shape: every column-level rule compiles to ONE aggregate
  * expression, and [[report]] evaluates ALL of them in a SINGLE pass over
  * the table (one job, no per-rule scans — at 100 TB the difference
  * between one read and a read per rule). Referential integrity is the
  * only rule needing a second input; it's a left-anti count against the
  * parent keys (broadcast when the parent is a dim).
  *
  * Each rule yields (check, metric, passed): `metric` is the measured
  * value (violation count or fraction), `passed` an INT flag so reports
  * hash-compare cleanly across engines.
  */
object Quality {

  final case class Rule(name: String, metric: Column, passed: Column)

  /** Fraction of nulls in `c` must be <= `maxFrac` (0 = strictly none). */
  def notNull(c: String, maxFrac: Double = 0.0): Rule = {
    val frac = coalesce(
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double") /
        nullif(count(lit(1)), lit(0)), lit(0.0))
    Rule(s"not_null:$c", round(frac + lit(1e-7), 6),
      when(frac <= maxFrac, 1).otherwise(0))
  }

  /** No duplicate values of the key tuple. SQL COUNT(DISTINCT ...)
    * semantics: rows with a null in any key column don't participate
    * (they're the not_null rules' business), so the metric matches
    * `count(<all keys non-null>) - count(DISTINCT keys)` in any engine. */
  def unique(cols: Seq[String]): Rule = {
    val allSet = cols.map(col(_).isNotNull).reduce(_ && _)
    val dups = coalesce(sum(when(allSet, 1L).otherwise(0L)), lit(0L)) -
      count_distinct(cols.map(col).head, cols.map(col).tail: _*)
    Rule(s"unique:${cols.mkString("+")}", dups.cast("double"),
      when(dups === 0, 1).otherwise(0))
  }

  /** Every non-null value of `c` is one of `values`. */
  def accepted(c: String, values: Seq[String]): Rule = {
    val bad = coalesce(sum(when(col(c).isNotNull && !col(c).isin(values: _*),
      1L).otherwise(0L)), lit(0L))
    Rule(s"accepted:$c", bad.cast("double"), when(bad === 0, 1).otherwise(0))
  }

  /** Row count within [min, max] (max < 0 = unbounded above). */
  def rowCount(min: Long, max: Long = -1L): Rule = {
    val n = count(lit(1))
    val ok = n >= min && (lit(max) < 0 || n <= max)
    Rule("row_count", n.cast("double"), when(ok, 1).otherwise(0))
  }

  /** Values of `c` within [lo, hi] when non-null. */
  def inRange(c: String, lo: Double, hi: Double): Rule = {
    // coalesce: sum over ZERO rows is NULL — an empty table must read as
    // a vacuous pass (0 violations), not crash report's getDouble
    val bad = coalesce(sum(when(col(c).isNotNull &&
      (col(c) < lo || col(c) > hi), 1L).otherwise(0L)), lit(0L))
    Rule(s"in_range:$c", bad.cast("double"), when(bad === 0, 1).otherwise(0))
  }

  /** Evaluate all single-pass rules in ONE aggregate job; one row per
    * rule, ordered by check name. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = rules.flatMap(r =>
      Seq(r.metric.as(s"m:${r.name}"), r.passed.as(s"p:${r.name}")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    // LAZY long format (r18): the one agg row explodes into one row per
    // rule inside the plan instead of a driver first() + local-relation
    // rebuild — so composing report with other checks (the
    // p_quality_report union with fkIntegrity) runs as ONE Spark job
    // whose independent subtrees execute concurrently, not two
    // driver-serialized actions.
    row.select(explode(array(rules.map(r => struct(
        lit(r.name).as("check"),
        col(s"m:${r.name}").cast("double").as("metric"),
        col(s"p:${r.name}").cast("int").as("passed"))): _*)).as("__r"))
      .select(col("__r.*"))
      .orderBy("check")
  }

  /** The per-row hash behind [[tableDigest]]/[[groupDigest]] — ONE copy
    * of the canonicalization any fix must touch. Each column is
    * length-prefixed (`"3:a|b"`), so a value CONTAINING the delimiter
    * cannot collide with a column split, and NULL encodes as a literal
    * `_` distinct from every real value (a plain concat_ws would
    * silently SKIP nulls, colliding (1,NULL,'B') with (1,'B',NULL)).
    * Columns must have engine-canonical string forms — keys, strings,
    * integers; floats format differently across engines. */
  private def rowDigest(cols: Seq[String]): Column = {
    val canon = cols.map { c =>
      val s = col(c).cast("string")
      coalesce(concat(length(s).cast("string"), lit(":"), s), lit("_"))
    }
    conv(substring(md5(concat_ws("|", canon: _*).cast("binary")), 1, 15),
      16, 10).cast("long")
  }

  /** 2^62: digest sums are reduced mod this so both engines stay inside
    * a positive BIGINT with exact (decimal) intermediate arithmetic. */
  private val DigestMod = 4611686018427387904L

  /** Order-independent 64-bit digest of selected columns: per row, md5
    * of the length-prefixed canonical strings truncated to 60 bits, then
    * an exact decimal SUM mod 2^62 — addition commutes, so ANY
    * partitioning/ordering of the same logical content yields the same
    * digest, and two environments can compare a 100 TB table by
    * exchanging ONE long. A SUM (not xor) is multiplicity-sensitive:
    * {X,X} vs {Y,Y} differ, where xor would cancel both to zero. */
  def tableDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    df.agg(
      coalesce(pmod(sum(rowDigest(cols).cast(DecimalType(38, 0))),
        lit(DigestMod)), lit(0)).cast("long").as("digest"),
      count(lit(1)).as("n_rows"))
  }

  /** Per-group digests — the incremental-sync primitive: compare two
    * copies of a table at partition grain and re-ship ONLY the groups
    * whose digest drifted, instead of diffing rows. Same construction
    * as [[tableDigest]], one aggregate pass. */
  def groupDigest(df: DataFrame, groupCols: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && cols.nonEmpty)
    df.groupBy(groupCols.map(col): _*)
      .agg(pmod(sum(rowDigest(cols).cast(DecimalType(38, 0))),
        lit(DigestMod)).cast("long").as("digest"),
        count(lit(1)).as("n_rows"))
  }

  /** Referential integrity: count of child rows whose key tuple has no
    * match in `parent` (nulls in the key don't count — they're the
    * not_null rules' business). Anti-join on the parent's distinct keys;
    * broadcast-sized when the parent is a dimension. */
  def fkIntegrity(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.length == parentKeys.length && childKeys.nonEmpty)
    val keys = parent.select(parentKeys.zip(childKeys)
      .map { case (p, c) => col(p).as(c) }: _*).distinct()
    val cond = childKeys.map(c => col(c).isNotNull).reduce(_ && _)
    // lazy for the same reason as [[report]]: a groupless agg always
    // yields exactly one row (count 0 on an empty orphan set)
    child.filter(cond).join(keys, childKeys, "left_anti")
      .agg(count(lit(1)).cast("double").as("metric"))
      .select(lit(s"fk:${childKeys.mkString("+")}").as("check"),
        col("metric"),
        when(col("metric") === 0.0, 1).otherwise(0).as("passed"))
  }
}

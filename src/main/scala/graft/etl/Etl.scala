package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL building blocks: surrogate keys, dimension-key lookup joins, the
  * fact reshapes (pivot, conditional aggregation), FK validation, and
  * idempotent loads — the Spark re-expression of the reference's
  * `load_dimensions.py` / `load_facts.py` machinery.
  */
object Etl {

  /** Deterministic surrogate key: dense row_number over an explicit stable
    * order, offset past the current max key (reference `INT IDENTITY`).
    * NOTE a global row_number is a single-partition sort of the KEYED rows
    * only — dimensions are small, so this is safe; facts get BIGINT keys
    * from `zipWithIndex`-free monotonic ids only when determinism is not
    * required (tests need reproducible keys, so dims use this). */
  def withSurrogateKey(df: DataFrame, keyCol: String, orderBy: Seq[Column],
      offset: Long = 0L): DataFrame =
    df.withColumn(keyCol,
      (row_number().over(Window.orderBy(orderBy: _*)) + offset).cast("int"))

  /** Dimension-key lookup: the reference builds python dicts and `.map()`s
    * them over fact columns (`load_facts.py:74-88`) — a hand-rolled
    * broadcast hash join. In Spark it IS a broadcast join. */
  def dimKeyJoin(fact: DataFrame, dim: DataFrame, businessKey: Seq[String],
      surrogateKey: String): DataFrame =
    fact.join(broadcast(dim.select((businessKey :+ surrogateKey).map(col): _*)),
      businessKey, "left")

  /** FK integrity validator: count of fact rows whose key has no match in
    * the dimension (reference orphan tests, `test_dwh.py:199-226`).
    * Spark has no FK constraints; ETL runs this post-load. */
  def orphanCount(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String): Long =
    fact.join(dim, fact(factKey) === dim(dimKey), "left_anti").count()

  /** Null-key rejection before fact insert (reference dropna). */
  def requireKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop(keys)

  /** Early-arriving facts, the constructive counterpart of
    * [[orphanCount]]: every distinct fact key with no dimension row gets
    * a PLACEHOLDER member (the Kimball "inferred member"), so the star
    * join stays inner and loses no facts; `defaults` fills the
    * placeholder attributes (unlisted columns go null) until the real
    * member arrives and an SCD1 overwrite corrects them. One left-anti
    * join on distinct fact keys — the added rows are bounded by distinct
    * orphans, not fact volume. */
  def inferredMembers(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, defaults: Map[String, Column]): DataFrame = {
    // null fact keys can never equi-match ANY member — they are
    // [[requireKeys]]' problem, not a placeholder to invent
    val missing = fact.select(col(factKey).as(dimKey))
      .filter(col(dimKey).isNotNull).distinct()
      .join(dim.select(dimKey), Seq(dimKey), "left_anti")
    val placeholders = dim.columns.foldLeft(missing) { (df, c) =>
      if (c == dimKey) df
      else df.withColumn(c, defaults.getOrElse(c, lit(null)))
    }.select(dim.columns.map(col): _*)
    dim.unionByName(placeholders)
  }

  /** Long→wide pivot of indicator rows (reference FILOSOFI pivot,
    * `load_facts.py:361-384`): one output row per group, indicators as
    * columns. `values` must be the explicit indicator list — an implicit
    * pivot triggers an extra distinct-scan job at scale. */
  def pivotIndicators(df: DataFrame, groupCols: Seq[String],
      indicatorCol: String, valueCol: String, values: Seq[String],
      rename: Map[String, String] = Map.empty): DataFrame = {
    val p = df.groupBy(groupCols.map(col): _*)
      .pivot(indicatorCol, values)
      .agg(first(col(valueCol)))
    rename.foldLeft(p) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
  }

  /** Idempotent load guard (reference skip-if-loaded,
    * `load_facts.py:163-167`): append only when the target is absent or
    * empty. Returns true when the write happened. */
  def appendIfEmpty(spark: SparkSession, df: DataFrame, path: String): Boolean = {
    val exists =
      try spark.read.parquet(path).limit(1).count() > 0
      catch { case _: Throwable => false }
    if (!exists) { df.write.mode("overwrite").parquet(path); true }
    else false
  }

  /** Computed persisted column (reference `solde_naturel AS (naissances -
    * deces) PERSISTED`): materialize at write time. */
  def withComputed(df: DataFrame, name: String, expr: Column): DataFrame =
    df.withColumn(name, expr)

  /** Skew-safe equi-join via key salting: the skewed (large) side gets a
    * random-ish salt in [0, salts); the small side is replicated once per
    * salt value. The join key becomes (key, salt), splitting a hot key
    * across `salts` reducers. AQE's skew-join handles sort-merge skew
    * automatically; salting is for the cases AQE can't split (e.g. a
    * single massive key in a shuffled hash join or aggregation).
    * Deterministic: salt derives from a hash of the whole row, not rand().
    * Join types where the small side may emit unmatched rows (right/full
    * outer) are rejected: the small side is replicated `salts` times, so
    * each unmatched row would appear `salts` times in the output. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched " +
        "small-side rows (replicated per salt); use inner/left/semi/anti")
    val l = large.withColumn("__salt",
      pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Year-partitioned fact write — the scale layout (SURVEY §4: replaces
    * the reference's fact indexes with partition pruning + DPP). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCol).parquet(path)

  /** Bucketed catalog-table write: rows hash-partitioned into `buckets`
    * files by `key` and sorted within each. Two tables bucketed the same
    * way join WITHOUT any exchange — the repeated fact⋈fact joins of the
    * datamart layer pay their shuffle once at write time instead of per
    * query, the decisive layout win at 100 TB (`ScaleSpec` asserts the
    * exchange-free plan). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}

package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Quality

/** Incremental datamart materialization on partition digests — the
  * reference's stage-5 "refresh datamarts" (`analytics/etl/run_etl.py:
  * 227-272` re-derives every view after each load) made affordable at
  * warehouse scale: ONE digest pass over the source detects which
  * (annee, departement)-style slices actually drifted since the last
  * refresh, and only those slices are rebuilt and overwritten. An
  * unchanged partition's files are left untouched on disk (dynamic
  * partition overwrite), so a 100 TB mart whose yesterday-only facts
  * changed rewrites one day, not the mart.
  *
  * Contract: `build` must be SLICE-LOCAL on `groupCols` — building the
  * mart from a group-filtered source must equal filtering the full mart
  * to those groups. Every reference datamart qualifies: they group by
  * (annee, departement) and never aggregate across those keys.
  *
  * Scale shape: the digest compare collects ONLY the drifted group keys
  * (bounded by the group grain — year × department is catalog-sized,
  * never fact-sized); the rebuild reads the drifted slice (partition-
  * prunable when the source shares the layout) and lands via dynamic
  * partition overwrite; groups that disappeared from the source have
  * their partition directories dropped explicitly (dynamic overwrite
  * only touches partitions present in the write).
  */
object Refresh {

  final case class Report(
      rebuilt: Seq[Map[String, String]],
      removed: Seq[Map[String, String]],
      unchanged: Long)

  private val DigestDir = "_digests"

  private def digestPath(martDir: String) = s"$martDir/$DigestDir"

  /** Incrementally refresh the materialized mart at `martDir`:
    * digest-compare `source` per `groupCols` against the stored digest
    * table, rebuild only drifted groups via `build`, drop vanished
    * groups, store the new digests. First call (no digest table yet)
    * materializes everything. */
  /** Group-key types that survive the string round-trip used by the drift
    * machinery (collect as Spark-cast string → compare/delete by that
    * string). Binary and nested types do not — fail fast instead of
    * silently never matching. */
  private def requireRoundTrippableKeys(source: DataFrame,
      groupCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types._
    groupCols.foreach { c =>
      source.schema(c).dataType match {
        case BinaryType | _: ArrayType | _: MapType | _: StructType =>
          throw new IllegalArgumentException(
            s"group column '$c' has type ${source.schema(c).dataType.sql}, " +
              "which does not round-trip through partition-key strings; " +
              "use string/numeric/date/timestamp group columns")
        case _ => ()
      }
    }
  }

  /** Collect the group-key tuples of `df` as STRINGS RENDERED BY SPARK'S
    * OWN CAST — the one canonical form shared by the literal filter, the
    * broadcast semi-join and the partition-directory encoding. Driver-side
    * `String.valueOf` disagrees with the SQL cast for timestamp
    * ("…00:00:00.0" vs "…00:00:00") and some decimal/float renderings, so
    * keys must never be stringified outside this function. */
  private def collectKeyStrings(df: DataFrame,
      groupCols: Seq[String]): Seq[Map[String, String]] =
    df.select(groupCols.map(c => col(c).cast("string").as(c)): _*)
      .collect()
      .map { r =>
        groupCols.zipWithIndex.map { case (c, i) =>
          require(!r.isNullAt(i),
            s"NULL group key in column '$c' — null partition keys are not " +
              "supported by the incremental refresh (reject them upstream)")
          c -> r.getString(i)
        }.toMap
      }.toSeq

  def refreshIncremental(spark: SparkSession, source: DataFrame,
      groupCols: Seq[String], digestCols: Seq[String],
      build: DataFrame => DataFrame, martDir: String): Report = {
    require(groupCols.nonEmpty, "need at least one partition column")
    requireRoundTrippableKeys(source, groupCols)
    val fresh = Quality.groupDigest(source, groupCols, digestCols)
      .withColumnRenamed("digest", "__new_digest")
      .withColumnRenamed("n_rows", "__new_rows")
    val fs = new org.apache.hadoop.fs.Path(martDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val havePrior = fs.exists(new org.apache.hadoop.fs.Path(digestPath(martDir)))

    val (driftKeys, removedKeys, unchanged) =
      if (!havePrior) {
        // first materialization: everything drifts, nothing to remove
        (collectKeyStrings(fresh, groupCols),
          Seq.empty[Map[String, String]], 0L)
      } else {
        val stored = spark.read.parquet(digestPath(martDir))
          .withColumnRenamed("digest", "__old_digest")
          .withColumnRenamed("n_rows", "__old_rows")
        // full outer: catches changed, brand-new AND vanished groups
        val cmp = fresh.join(stored, groupCols, "full_outer").persist()
        try {
          def keysOf(df: DataFrame) = collectKeyStrings(df, groupCols)
          val drift = keysOf(cmp.filter(col("__old_digest").isNull ||
            !(col("__new_digest") === col("__old_digest") &&
              col("__new_rows") === col("__old_rows"))))
          val removed = keysOf(cmp.filter(col("__new_digest").isNull))
          val same = cmp.filter(col("__new_digest") === col("__old_digest") &&
            col("__new_rows") === col("__old_rows")).count()
          // a vanished group has NULL new digest: it lands in `drift` via
          // the isNull-or-different test only when old exists & new null —
          // exclude it from the rebuild list (there is nothing to build)
          (drift.diff(removed), removed, same)
        } finally cmp.unpersist()
      }

    if (!havePrior) {
      // first materialization: one full build, no per-group filter
      build(source)
        .write.mode("overwrite")
        .partitionBy(groupCols: _*)
        .parquet(martDir)
    } else if (driftKeys.nonEmpty) {
      build(driftedSlice(spark, source, groupCols, driftKeys))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(groupCols: _*)
        .parquet(martDir)
    }
    // dynamic overwrite never deletes: drop vanished groups' directories.
    // Directory values use the same Hive path escaping Spark's writer
    // applies (':' in timestamps, '/' etc.), so escape before matching.
    removedKeys.foreach { k =>
      val rel = groupCols.map { c =>
        val v = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(k(c))
        s"$c=$v"
      }.mkString("/")
      fs.delete(new org.apache.hadoop.fs.Path(s"$martDir/$rel"), true)
    }
    // store the digest table for the next refresh (hidden from readers:
    // the underscore-prefixed dir is ignored by Spark's file index)
    fresh
      .withColumnRenamed("__new_digest", "digest")
      .withColumnRenamed("__new_rows", "n_rows")
      .write.mode("overwrite").parquet(digestPath(martDir))
    Report(driftKeys, removedKeys, unchanged)
  }

  /** Above this many drifted groups the literal predicate switches to a
    * broadcast semi-join. ~64 keeps the OR-of-ANDs well inside what the
    * analyzer and parquet filter pushdown handle comfortably. */
  private[graft] val MaxLiteralDriftKeys = 64

  /** Restrict `source` to the drifted groups.
    *
    * Small drift sets (the common incremental case) become a literal
    * OR-of-ANDs predicate — it pushes to the parquet scan and prunes
    * partitions on a co-partitioned source. But the expression tree grows
    * linearly in keys×cols: past ~100 disjuncts the analyzer cost climbs
    * and pushdown degrades, so a large drift set (a backfill touching
    * thousands of groups) instead left-semi-joins a broadcast key frame.
    * The key frame is driver-held and catalog-grain-bounded (digest rows,
    * never fact rows). Keys arrive as Spark-cast strings (the one
    * canonical form — see `collectKeyStrings`); BOTH branches compare by
    * casting the KEY side back to the source column's type, so the source
    * column stays typed (pushdown/pruning intact) and timestamp/decimal
    * keys round-trip exactly instead of diverging on Java-vs-SQL string
    * renderings. */
  private[graft] def driftedSlice(spark: SparkSession, source: DataFrame,
      groupCols: Seq[String], driftKeys: Seq[Map[String, String]]): DataFrame = {
    requireRoundTrippableKeys(source, groupCols)
    val keyTypes = groupCols.map(c => c -> source.schema(c).dataType).toMap
    if (driftKeys.size <= MaxLiteralDriftKeys) {
      val pred = driftKeys.map(k =>
        groupCols.map(c => col(c) === lit(k(c)).cast(keyTypes(c)))
          .reduce(_ && _))
        .reduce(_ || _)
      source.filter(pred)
    } else {
      import spark.implicits._
      val keyDf = driftKeys.map(k => groupCols.map(k))
        .toDF("__k")
        .select(groupCols.zipWithIndex.map { case (c, i) =>
          col("__k").getItem(i).cast(keyTypes(c)).as(s"__key_$c") }: _*)
      val cond = groupCols.map(c =>
        source(c) === keyDf(s"__key_$c")).reduce(_ && _)
      source.join(broadcast(keyDf), cond, "left_semi")
    }
  }
}

package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit form of Spark's own runtime
  * filter (`InjectRuntimeFilter`): build a bloom filter over the build
  * side's join keys (one aggregate producing a few-KB binary scalar) and
  * drop probe-side rows that cannot match BEFORE the shuffle/join.
  *
  * At 100 TB this is the difference between shuffling the full probe
  * table and shuffling only rows whose key might exist on the build side
  * — with a selective build side (the common star-schema case: a filtered
  * dimension) that is a 10-100x cut, and `might_contain` on a parquet
  * scan column additionally prunes at the row-group level. False
  * positives are harmless: the exact join that follows removes them, so
  * results are identical to the unfiltered join.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * Catalyst expressions (codegen'd, spill-safe) registered under
  * `bloom_filter_agg` / `might_contain`, keyed by `xxhash64` like the
  * built-in runtime filter.
  */
object BloomOps {

  /** Idempotent registration for SQL / `call_function` use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_filter_agg",
      FnReg.checkedRange("bloom_filter_agg", 1, 3)(exprs => exprs.size match {
        case 1 => new BloomFilterAggregate(exprs.head)
        case 2 => new BloomFilterAggregate(exprs(0), exprs(1))
        case _ => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      }), "built-in")
    reg.createOrReplaceTempFunction("might_contain",
      FnReg.checked("might_contain", 2)(exprs =>
        BloomFilterMightContain(exprs(0), exprs(1))), "built-in")
  }

  /** `large` rows whose `largeKey` might appear among `small`'s
    * `smallKey` values (bloom pre-filter; no false negatives). The bloom
    * binary is a driver-side scalar — that is one small aggregate job,
    * the same shape as a broadcast variable, NOT a per-row collect. */
  def prefilter(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    register(large.sparkSession)
    val bytes = Option(small
      .select(call_function("bloom_filter_agg",
        xxhash64(col(smallKey)), lit(expectedItems)).as("bf"))
      .head().getAs[Array[Byte]](0))
    bytes match {
      case Some(b) => large.filter(
        call_function("might_contain", lit(b), xxhash64(col(largeKey))))
      // empty build side aggregates to a null bloom: nothing can match
      // the join that follows, so drop everything up front
      case None => large.filter(lit(false))
    }
  }
}

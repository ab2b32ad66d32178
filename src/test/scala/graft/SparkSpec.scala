package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
object TestSession {
  lazy val spark: SparkSession =
    graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  def sf001 = "/root/testdata/sf0.001"

  /** Finalized (post-AQE) physical plan string of `df` — collect() first
    * so AdaptiveSparkPlan prints the final plan, not the initial one. */
  def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.etl.Etl

/** Scale mechanics: partition pruning on partitioned writes, salted skew
  * joins, and spread()'s parallelism contract. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned fact write prunes partitions on year predicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/fact"
    val fact = graft.core.Tables.load(spark, sf001, "orders")
      .withColumn("o_year", year($"o_orderdate"))
    Etl.writePartitioned(fact, dir, "o_year")

    val read = spark.read.parquet(dir).filter($"o_year" === 1997)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"))
    // pruned read returns exactly the 1997 rows
    val expected = fact.filter($"o_year" === 1997).count()
    assert(read.count() == expected && expected > 0)
    // partition count on disk = distinct years
    val dirs = new java.io.File(dir).list().count(_.startsWith("o_year="))
    assert(dirs == fact.select("o_year").distinct().count())
  }

  test("salted join splits a hot key and matches the plain join result") {
    // 10k rows of one hot key + a small dimension
    val large = (1 to 10000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i))
      .toDF("k", "v")
    val small = Seq(("HOT", "hot-dim"), ("cold10", "c10")).toDF("k", "label")
    val plain = large.join(small, Seq("k")).agg(count(lit(1)), sum("v")).first()
    val salted = Etl.saltedJoin(large, small, "k", salts = 8)
      .agg(count(lit(1)), sum("v")).first()
    assert(salted.getLong(0) == plain.getLong(0))
    assert(salted.getLong(1) == plain.getLong(1))
    // every salt bucket got some of the hot key (the split actually happened)
    val buckets = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(8)))
      .filter($"k" === "HOT").select("__salt").distinct().count()
    assert(buckets > 1)
  }

  test("spread raises single-file scans to session parallelism") {
    val docs = graft.core.Tables.load(spark, sf001, "documents")
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val spreadDf = graft.core.Tables.spread(docs)
    assert(spreadDf.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(spreadDf.count() == docs.count())
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.IvfPq

/** IVF-PQ composed index: residual codes bounded, probed search agrees
  * with exact L2, nprobe widens recall. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def corpus = {
    val rnd = new scala.util.Random(23)
    val anchors = Seq(
      Seq.fill(dim)(0.0), Seq.fill(dim)(10.0),
      (0 until dim).map(i => if (i % 2 == 0) 10.0 else 0.0),
      (0 until dim).map(i => if (i % 2 == 0) 0.0 else 10.0))
    (0 until 80).map { i =>
      val a = anchors(i % 4)
      (i.toLong, a.map(x => (x + rnd.nextGaussian() * 0.4).toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("IVF-PQ: compact index, probed ADC search finds the query's cluster") {
    val (index, meta) = IvfPq.build(corpus, "embedding", "vec_id",
      nCells = 4, m = 4, k = 4, iters = 3)
    val idx = index.persist()
    // index frame is (id, cell, codes) — bytes per vector, nothing else
    assert(idx.columns.toSeq == Seq("vec_id", "cell", "pq_code"))
    assert(idx.count() == 80)
    val codes = idx.select("pq_code").as[Seq[Int]].collect()
    assert(codes.forall(c => c.size == 4 && c.forall(x => x >= 0 && x < 4)))

    val q = Seq.fill(dim)(10.0)
    val exact = corpus.select($"vec_id",
        aggregate(zip_with($"embedding", array(q.map(lit): _*),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
          .as("d2"))
      .orderBy($"d2".asc, $"vec_id").limit(10)
      .select("vec_id").as[Long].collect().toSet

    val hits = IvfPq.search(idx, meta, "vec_id", q, k = 10, nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(hits.length == 10)
    assert(hits.forall(_ % 4 == 1), s"nprobe=1 must stay in the query's cell")
    assert((hits.toSet & exact).size >= 7,
      s"probed ADC vs exact overlap: ${(hits.toSet & exact).size}")

    // widening nprobe can only grow the candidate pool
    val wide = IvfPq.search(idx, meta, "vec_id", q, k = 40, nprobe = 4)
      .select("vec_id").as[Long].collect()
    assert(wide.length == 40)
    idx.unpersist()
  }

  test("searchBatch reproduces the single-query path for every query") {
    val (index, meta) = IvfPq.build(corpus, "embedding", "vec_id",
      nCells = 4, m = 4, k = 4, iters = 3)
    val idx = index.persist()
    val queries = corpus.filter($"vec_id" < 6)
    val batch = IvfPq.searchBatch(idx, meta, queries, "embedding",
      "vec_id", k = 5, nprobe = 2)
      .select("q_id", "nbr_id", "adc")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(r => (r._3, r._2)).map(_._2).toSeq).toMap
    queries.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .foreach { case (qid, emb) =>
        val single = IvfPq.search(idx, meta, "vec_id",
          emb.map(_.toDouble), k = 5, nprobe = 2)
          .select("vec_id").as[Long].collect().toSeq
        assert(batch(qid) == single,
          s"query $qid: batch must equal the single-query path")
      }
    idx.unpersist()
  }
}

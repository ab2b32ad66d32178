package graft

import org.apache.spark.sql.functions._
import graft.ext.QualityModel

/** Logistic-regression quality classifier (ext.QualityModel). */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // separable toy corpus: positives are stopword-rich English, negatives
  // punctuation-heavy noise
  private def docs = Seq(
    (1L, "the cat sat on the mat and it is a fine day for all of us", 1),
    (2L, "it is the best of times and the worst of times for a story", 1),
    (3L, "x!!! y??? z!!! #### $$$$ %%%% !!!! ???? @@@@ ^^^^", 0),
    (4L, "qq!! ww?? ee!! rr?? tt!! yy?? uu!! ii??", 0))
    .toDF("doc_id", "text", "label")

  test("gradient descent separates the classes and is deterministic") {
    val feat = QualityModel.featureFrame(docs, "text", "doc_id",
      col("label") === 1).persist()
    val w = QualityModel.train(feat, lr = 1.0, steps = 25)
    val scores = feat.select(col("doc_id"),
      QualityModel.score(feat, w).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(3L) && scores(2L) > scores(4L),
      s"positives must outscore negatives: $scores")
    assert((scores(1L) + scores(2L)) / 2 > (scores(3L) + scores(4L)) / 2 + 0.1)
    val w2 = QualityModel.train(feat, lr = 1.0, steps = 25)
    assert(w.toSeq == w2.toSeq, "training must be exactly reproducible")
    feat.unpersist()
  }

  test("one GD step matches the hand-derived update") {
    // two docs, y = (1, 0); from w = 0 every sigma is 0.5, so
    // w_j = lr/2 * [ (1-0.5)*x_j(doc1) + (0-0.5)*x_j(doc2) ]
    val two = docs.filter(col("doc_id").isin(1L, 3L))
    val feat = QualityModel.featureFrame(two, "text", "doc_id",
      col("label") === 1)
    val rows = feat.orderBy("doc_id").collect()
    val x1 = QualityModel.FeatureNames.map(f =>
      rows(0).getDouble(rows(0).fieldIndex(f)))
    val x3 = QualityModel.FeatureNames.map(f =>
      rows(1).getDouble(rows(1).fieldIndex(f)))
    val expected = x1.zip(x3).map { case (a, b) => 0.5 * (0.5 * a - 0.5 * b) }
    val w = QualityModel.train(feat, lr = 1.0, steps = 1)
    w.zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-12, s"$got vs $exp")
    }
  }

  test("features are null-free on empty and degenerate docs") {
    val weird = Seq((1L, "", 0), (2L, "   ", 0), (3L, "one", 1))
      .toDF("doc_id", "text", "label")
    val feat = QualityModel.featureFrame(weird, "text", "doc_id",
      col("label") === 1)
    val anyNull = QualityModel.FeatureNames
      .map(f => sum(col(f).isNull.cast("int"))).reduce(_ + _)
    assert(feat.agg(anyNull).first().getLong(0) == 0L)
    // training on degenerate input still yields finite weights
    val w = QualityModel.train(feat, steps = 3)
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
  }
}

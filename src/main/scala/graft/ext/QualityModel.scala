package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier over surface text features — the modern
  * curation filter (public method: the fastText-style quality classifiers
  * of DCLM / FineWeb-Edu score every document and the pipeline keeps the
  * top fraction). This engine trains a logistic regression by FULL-BATCH
  * gradient descent where each step is ONE distributed aggregation — the
  * same driver-holds-the-tiny-model / cluster-holds-the-data shape as
  * Lloyd's k-means in [[Ivf.train]]:
  *
  *   w ← w + (lr/N) · Σ_docs (y − σ(wᵀx)) · x
  *
  * The model is d+1 doubles on the driver; the corpus is scanned once per
  * step with the feature projection fused into the scan (persist the
  * feature frame for multi-step training, as the gate query does). No
  * MLlib dependency: the loop IS the operator, and a fixed step count
  * with w₀ = 0 makes training exactly reproducible — the DuckDB oracle
  * re-derives every iteration.
  *
  * Features are the [[graft.functions.TextStats]] surface signals
  * (length, vocabulary diversity, punctuation share, stopword share,
  * word shape) — deliberately cheap, codegen-friendly, and
  * SQL-mirrorable. At 100 TB: training cost = steps × one scan of the
  * (persisted, columnar) feature frame; scoring is a pure projection.
  */
object QualityModel {

  /** Feature columns over a lowercase-token text column: bounded, unit-
    * scale surface signals + bias. Null-free (empty docs → zeros). */
  def features(text: Column): Seq[Column] = {
    val toks = TextAnalysis.tokens(lower(text))
    val n = size(toks)
    Seq(
      least(n.cast("double") / 100.0, lit(2.0)), // bounded length
      coalesce(size(array_distinct(toks)).cast("double") /
        nullif(n, lit(0)), lit(0.0)), // type-token ratio
      coalesce(TextAnalysis.punctRatio(text), lit(0.0)),
      coalesce(TextAnalysis.stopwordRatio(text, "en"), lit(0.0)),
      coalesce(TextAnalysis.meanWordLen(text) / 10.0, lit(0.0)),
      lit(1.0)) // bias
  }

  val FeatureNames: Seq[String] =
    Seq("len_b", "ttr", "punct", "stop_en", "mwl", "bias")

  /** Train `steps` full-batch GD steps from w = 0; returns the weights.
    * `labelCol` must be 0/1. The input should be the PERSISTED feature
    * frame from [[featureFrame]] (each step scans it once). */
  def train(feat: DataFrame, lr: Double = 1.0, steps: Int = 10): Array[Double] = {
    val d = FeatureNames.length
    var w = Array.fill(d)(0.0)
    (1 to steps).foreach { _ =>
      val margin = FeatureNames.zip(w)
        .map { case (f, wi) => col(f) * wi }.reduce(_ + _)
      val resid = col("y") - lit(1.0) / (lit(1.0) + exp(-margin))
      val grads = feat.agg(
        count(lit(1)).cast("double").as("__n"),
        FeatureNames.map(f => sum(resid * col(f)).as(s"__g_$f")): _*)
        .first()
      val n = grads.getDouble(0)
      w = w.zipWithIndex.map { case (wi, i) =>
        wi + lr / n * grads.getDouble(i + 1)
      }
    }
    w
  }

  /** (idCol, y, feature columns) — persist this before training. */
  def featureFrame(docs: DataFrame, textCol: String, idCol: String,
      label: Column): DataFrame =
    docs.select(
      col(idCol) +: label.cast("int").as("y") +:
        features(col(textCol)).zip(FeatureNames)
          .map { case (c, n) => c.as(n) }: _*)

  /** Score with trained weights: σ(wᵀx), a pure projection. */
  def score(feat: DataFrame, w: Array[Double]): Column = {
    val margin = FeatureNames.zip(w)
      .map { case (f, wi) => col(f) * wi }.reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }
}

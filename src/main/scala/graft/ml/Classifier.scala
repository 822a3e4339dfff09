package graft.ml

import org.apache.spark.sql.{DataFrame, functions => F}

/** Distributed linear text classification over hashed n-gram features — the
  * fastText-style quality-classifier shape (score the whole corpus by "does
  * this look like the curated seed set": the reference-quality filter used
  * by LLaMA-class data pipelines). Features come from
  * [[Sampling.hashedNgramBuckets]]; the MODEL is a weight per hash bucket
  * (+ bias) — ≤ B+1 doubles of bounded state, trained by full-batch
  * gradient descent where each epoch is two hash-aggregated joins and one
  * B-row collect. Nothing driver-side ever scales with the corpus.
  *
  * Epoch shape: margins = features ⋈ broadcast(weights) → groupBy(id);
  * residuals = σ(margin) − y; gradient = features ⋈ residuals →
  * groupBy(bucket); collect ≤ B+1 cells; step. The two shuffles are keyed
  * on id and bucket — the same keys the feature table already uses, so at
  * 100 TB the feature frame is persisted once and every epoch re-reads the
  * cached partitions.
  */
object Classifier {

  /** Model: dense weights indexed by bucket, plus bias. */
  final case class LinearModel(weights: Array[Double], bias: Double) {
    def buckets: Int = weights.length
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Full-batch logistic regression on (id, bucket, cnt) features and
    * (id, label) targets (label ∈ {0, 1}). Gradient descent with fixed
    * `lr`, L2 strength `l2`, `epochs` passes. Rows of `labels` without
    * features train on bias alone (their margin is just the bias —
    * matching a scorer that sees an empty document). Deterministic given
    * the inputs (no RNG; init at zero). */
  def logisticFit(features: DataFrame, labels: DataFrame, idCol: String,
                  buckets: Int, epochs: Int = 20, lr: Double = 0.5,
                  l2: Double = 1e-4): LinearModel = {
    require(epochs > 0, s"logisticFit: epochs must be > 0, got $epochs")
    require(buckets > 0, s"logisticFit: buckets must be > 0, got $buckets")
    val spark = features.sparkSession
    import spark.implicits._
    val feats = graft.kernel.PrepCache.persistBounded(
      features.select(F.col(idCol), F.col("bucket"), F.col("cnt").cast("double").as("x")))
    val lab = graft.kernel.PrepCache.persistBounded(
      labels.select(F.col(idCol), F.col("label").cast("double").as("y")))
    val n = lab.count().toDouble
    require(n > 0, "logisticFit: empty label set")
    val w = new Array[Double](buckets)
    var bias = 0.0
    for (_ <- 0 until epochs) {
      val wDf = F.broadcast(w.toIndexedSeq.zipWithIndex
        .map { case (wt, b) => (b, wt) }.toDF("bucket", "w"))
      // margin per labeled doc (docs with no features fall back to bias)
      val margins = lab
        .join(feats, Seq(idCol), "left")
        .join(wDf, Seq("bucket"), "left")
        .groupBy(idCol)
        .agg(F.first("y").as("y"),
          (F.coalesce(F.sum(F.col("x") * F.col("w")), F.lit(0.0)) + bias).as("m"))
      val resid = margins.select(F.col(idCol),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("y")).as("r"))
      // bucket gradient + bias gradient in one pass over the feature rows
      val grad = feats.join(resid, Seq(idCol))
        .groupBy("bucket").agg(F.sum(F.col("x") * F.col("r")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val biasGrad = resid.agg(F.sum("r")).collect()(0).getDouble(0)
      var b = 0
      while (b < buckets) {
        w(b) -= lr * ((grad.getOrElse(b, 0.0) / n) + l2 * w(b))
        b += 1
      }
      bias -= lr * (biasGrad / n)
    }
    LinearModel(w, bias)
  }

  /** Score every document: σ(w·x + bias), one broadcast join + one
    * hash-aggregate. Documents of `docs` with no feature rows score
    * σ(bias). */
  def logisticScore(docs: DataFrame, features: DataFrame, idCol: String,
                    model: LinearModel,
                    scoreCol: String = "quality_score"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = F.broadcast(model.weights.toIndexedSeq.zipWithIndex
      .map { case (wt, b) => (b, wt) }.toDF("bucket", "w"))
    val margins = features.join(wDf, Seq("bucket"))
      .groupBy(idCol).agg(F.sum(F.col("cnt") * F.col("w")).as("__m__"))
    docs.select(F.col(idCol)).join(margins, Seq(idCol), "left")
      .select(F.col(idCol),
        (F.lit(1.0) / (F.lit(1.0) +
          F.exp(-(F.coalesce(F.col("__m__"), F.lit(0.0)) + model.bias))))
          .as(scoreCol))
  }

  /** Training-set accuracy at threshold 0.5 — the convergence sanity
    * scalar. */
  def accuracy(scored: DataFrame, labels: DataFrame, idCol: String,
               scoreCol: String = "quality_score"): Double = {
    val joined = scored.join(labels, Seq(idCol))
    val agg = joined.agg(
      F.sum(F.when((F.col(scoreCol) >= 0.5) === (F.col("label") === 1), 1L)
        .otherwise(0L)).as("ok"),
      F.count(F.lit(1)).as("n")).collect()(0)
    agg.getLong(0).toDouble / agg.getLong(1)
  }
}

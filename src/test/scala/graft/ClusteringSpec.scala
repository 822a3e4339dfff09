package graft

import org.apache.spark.sql.{functions => F}
import graft.ml.{Clustering, Sampling, Similarity}

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("id", "v").withColumn("v", F.col("v").cast("array<double>"))

  test("kmeansFit recovers two well-separated blobs; assignment is argmin") {
    // blob A around (0,0), blob B around (10,10)
    val a = (0L until 8L).map(i => (i, Seq(0.0 + i * 0.01, 0.0 - i * 0.01)))
    val b = (8L until 16L).map(i => (i, Seq(10.0 + i * 0.01, 10.0 - i * 0.01)))
    val df = vecs(a ++ b: _*)
    val cents = Clustering.kmeansFit(df, "v", k = 2, maxIter = 10)
    assert(cents.length == 2)
    // each centroid sits inside one blob
    val byX = cents.sortBy(_.head)
    assert(byX(0).head < 1.0 && byX(1).head > 9.0)
    // every blob-A point assigns to the low centroid, blob-B to the high one
    val assigned = Clustering.kmeansAssign(df, "v", cents)
    val groups = assigned.groupBy("cluster_id")
      .agg(F.min("id").as("lo"), F.max("id").as("hi")).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(groups.toSeq == Seq((0L, 7L), (8L, 15L)))
    // inertia is the within-blob spread only (tiny), not cross-blob
    assert(Clustering.inertia(df, "v", cents) < 1.0)
  }

  test("kmeansFit: deterministic across reruns; empty-cluster keeps centroid") {
    val df = vecs((0L until 12L).map(i => (i, Seq(i.toDouble, (i * 7 % 5).toDouble))): _*)
    val c1 = Clustering.kmeansFit(df, "v", k = 3)
    val c2 = Clustering.kmeansFit(df, "v", k = 3)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // init seeds are DISTINCT vectors: a duplicate-heavy corpus with fewer
    // distinct points than k fails fast instead of silently freezing
    // duplicate centroids into degenerate clusters
    val dup = vecs(((0L until 6L).map(i => (i, Seq(1.0, 2.0))) :+ (9L, Seq(3.0, 4.0))): _*)
    val c3 = Clustering.kmeansFit(dup, "v", k = 2)
    assert(c3.map(_.toSeq).toSet == Set(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    intercept[IllegalArgumentException] {
      Clustering.kmeansFit(dup, "v", k = 3) // only 2 distinct vectors
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansFit(vecs((1L, Seq(1.0, 1.0))), "v", k = 5)
    }
  }

  test("semanticPairs: only within-cluster, above-threshold, a<b pairs") {
    val df = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.999, 0.04), 0), (3L, Seq(0.0, 1.0), 0),
      (4L, Seq(1.0, 0.0), 1)) // same direction as 1 but another cluster
      .toDF("id", "nv", "cluster_id")
      .withColumn("nv", graft.ml.Similarity.l2Normalize(F.col("nv").cast("array<double>")))
    val pairs = Clustering.semanticPairs(df, "nv", "id", threshold = 0.97)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // 3 orthogonal, 4 cross-cluster
  }

  test("semanticDedup keeps min-id exemplar per near-dup ball, transitively") {
    // three near-identical directions (ids 1,2,3), one distinct (id 9)
    val base = Seq(1.0, 2.0, 3.0, 4.0)
    def jitter(eps: Double) = base.zipWithIndex.map { case (x, i) => x + eps * (i % 2) }
    val df = Seq(
      (1L, base), (2L, jitter(0.001)), (3L, jitter(0.002)),
      (9L, Seq(-4.0, 3.0, -2.0, 1.0)))
      .toDF("vec_id", "embedding")
    val kept = Clustering.semanticDedup(df, "embedding", "vec_id", k = 2, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 9L))
  }

  test("dsir: target-like docs outweigh off-target; resample deterministic") {
    val raw = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "qq ww ee rr tt yy")).toDF("doc_id", "text")
    val target = Seq((100L, "the cat sat on the mat the dog sat"))
      .toDF("doc_id", "text")
    val rb = Sampling.hashedNgramBuckets(raw, "text", "doc_id")
    val tb = Sampling.hashedNgramBuckets(target, "text", "doc_id")
    val w = Sampling.dsirLogWeights(rb, tb, "doc_id")
    val m = w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.size == 4)
    // english-like docs score higher than the off-target ones
    assert(m(1L) > m(3L) && m(2L) > m(4L))
    val top = Sampling.dsirResample(w, "doc_id", n = 2)
    val again = Sampling.dsirResample(w, "doc_id", n = 2)
    assert(top.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    intercept[IllegalArgumentException] { Sampling.dsirResample(w, "doc_id", n = 0) }
  }

  test("logistic classifier separates bigram-disjoint classes; deterministic") {
    import graft.ml.Classifier
    // class 1 shares bigrams among themselves, class 0 likewise — linearly
    // separable in hashed-bigram space
    val docs = Seq(
      (1L, "good clean prose flows well", 1),
      (2L, "clean prose flows well today", 1),
      (3L, "good clean prose reads well", 1),
      (4L, "zz xx qq ww vv kk", 0),
      (5L, "xx qq ww vv kk zz", 0),
      (6L, "qq ww vv kk zz xx", 0)).toDF("doc_id", "text", "label")
    val feats = Sampling.hashedNgramBuckets(docs, "text", "doc_id", buckets = 256)
    val model = Classifier.logisticFit(
      feats, docs.select("doc_id", "label"), "doc_id", buckets = 256, epochs = 30)
    val scored = Classifier.logisticScore(docs, feats, "doc_id", model)
    assert(Classifier.accuracy(scored, docs.select("doc_id", "label"), "doc_id") == 1.0)
    // deterministic refit
    val again = Classifier.logisticFit(
      feats, docs.select("doc_id", "label"), "doc_id", buckets = 256, epochs = 30)
    assert(model.weights.toSeq == again.weights.toSeq && model.bias == again.bias)
    // unseen doc with no features scores sigmoid(bias)
    val cold = Classifier.logisticScore(
      Seq((99L, "")).toDF("doc_id", "text"), feats.limit(0), "doc_id", model)
      .collect()(0).getDouble(1)
    assert(math.abs(cold - 1.0 / (1.0 + math.exp(-model.bias))) < 1e-12)
    intercept[IllegalArgumentException] {
      Classifier.logisticFit(feats, docs.select("doc_id", "label"), "doc_id", 256, epochs = 0)
    }
  }

  test("hashedNgramBuckets: counts sum to n-gram count, buckets bounded") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text") // 3 bigrams
    val b = Sampling.hashedNgramBuckets(df, "text", "doc_id", n = 2, buckets = 16)
    val rows = b.collect()
    assert(rows.map(_.getLong(2)).sum == 3L)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 16))
    // unigram path
    val u = Sampling.hashedNgramBuckets(df, "text", "doc_id", n = 1, buckets = 16)
    assert(u.collect().map(_.getLong(2)).sum == 4L)
  }
}

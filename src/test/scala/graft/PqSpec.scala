package graft

import org.apache.spark.sql.{functions => F}
import graft.ml.Similarity

/** Product-quantization invariants: deterministic training, exact round trip
  * when the codebook can represent the corpus exactly, ADC = true distance in
  * that regime, and bounded behavior otherwise. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (1L to n).map(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
  }

  test("codes are in range and training is deterministic") {
    val df = vecs(60, 16, 1L)
    val cb1 = Similarity.pqTrain(df, "v", m = 4, k = 8, sampleSize = 60)
    val cb2 = Similarity.pqTrain(df, "v", m = 4, k = 8, sampleSize = 60)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = Similarity.pqEncode(df, "v", "id", cb1).collect()
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 8)))
    assert(codes.forall(_.getSeq[Int](1).size == 4))
  }

  test("k distinct vectors with k centroids quantize exactly; ADC equals true distance") {
    // k points per subspace and k centroids: Lloyd's converges to the points
    // themselves, so encoding is lossless and ADC = exact L2
    val k = 8
    val df = vecs(k, 16, 2L)
    val cb = Similarity.pqTrain(df, "v", m = 4, k = k, iters = 20, sampleSize = k)
    val codes = Similarity.pqEncode(df, "v", "id", cb)
    val query = df.filter(F.col("id") === 3L).collect()(0).getSeq[Float](1).map(_.toDouble).toSeq
    val lut = Similarity.pqLut(query, cb)
    val top = Similarity.pqTopK(codes, "id", lut, k = 3).collect()
    // the query's own vector is its exact nearest neighbor at distance ~0
    assert(top(0).getLong(0) == 3L)
    assert(top(0).getDouble(1) < 1e-6)
    // ADC distances equal exact distances for every vector
    val exact = df.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      r.getLong(0) -> math.sqrt(v.zip(query).map { case (a, b) => val d = a - b; d * d }.sum)
    }.toMap
    val adc = codes.select(F.col("id"),
        Similarity.pqAdcDistance(F.col("codes"), lut).as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    adc.foreach { case (id, d) => assert(math.abs(d - exact(id)) < 1e-6, s"id=$id") }
  }

  test("ADC distance is nonnegative and the top-k order is deterministic") {
    val df = vecs(100, 32, 3L)
    val cb = Similarity.pqTrain(df, "v", m = 8, k = 16, sampleSize = 100)
    val codes = Similarity.pqEncode(df, "v", "id", cb).cache()
    val query = Seq.fill(32)(0.1)
    val lut = Similarity.pqLut(query, cb)
    val a = Similarity.pqTopK(codes, "id", lut, k = 10).collect().map(_.getLong(0)).toSeq
    val b = Similarity.pqTopK(codes, "id", lut, k = 10).collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 10)
    val dists = codes.select(Similarity.pqAdcDistance(F.col("codes"), lut)).collect().map(_.getDouble(0))
    assert(dists.forall(d => d >= 0.0 && !d.isNaN))
  }
}

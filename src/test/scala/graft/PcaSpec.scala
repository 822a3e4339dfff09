package graft

import graft.ml.Pca
import org.apache.spark.sql.{functions => F}

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobiEigen recovers a known diagonalization") {
    // A = [[2, 1], [1, 2]] has eigenvalues 3 (v = (1,1)/√2) and 1 (v = (1,-1)/√2)
    val (values, vectors) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = values.indices.sortBy(i => -values(i))
    assert(math.abs(values(order(0)) - 3.0) < 1e-10)
    assert(math.abs(values(order(1)) - 1.0) < 1e-10)
    val v0 = Array(vectors(0)(order(0)), vectors(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1 / math.sqrt(2)) < 1e-10)
    assert(math.abs(v0(0) - v0(1)) < 1e-10) // same sign, equal components
  }

  test("fit: components are orthonormal, variances descend and match projections") {
    val rnd = new scala.util.Random(11)
    // anisotropic cloud: x ~ 5·N, y ~ 2·N, z ~ 0.3·N, rotated by correlating y with x
    val rows = Seq.fill(400) {
      val a = rnd.nextGaussian() * 5; val b = rnd.nextGaussian() * 2; val c = rnd.nextGaussian() * 0.3
      (Seq((a + 1).toFloat, (0.6 * a + b - 2).toFloat, (c + 0.5).toFloat), 0L)
    }
    val df = rows.toDF("embedding", "vec_id")
    val m = Pca.fit(df, "embedding", k = 3)
    // orthonormal
    for (i <- 0 until 3; j <- 0 until 3) {
      val d = dot(m.components(i), m.components(j))
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"dot($i,$j)=$d")
    }
    // descending variance
    assert(m.variance(0) >= m.variance(1) && m.variance(1) >= m.variance(2))
    // component variance == variance of the projected coordinate (population)
    val proj = Pca.transform(df, "embedding", m, "p")
      .select(F.col("p")(0).as("p0")).as[Double].collect()
    val mean = proj.sum / proj.length
    val popVar = proj.map(x => (x - mean) * (x - mean)).sum / proj.length
    assert(math.abs(popVar - m.variance(0)) / m.variance(0) < 1e-6)
    // the dominant axis is the injected x-direction mixture, variance >> axis 3
    assert(m.variance(0) > 10 * m.variance(2))
  }

  test("transform at k = d reconstructs distances; whiten gives unit variance") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Seq.fill(4)((rnd.nextGaussian() * (1 + rnd.nextInt(3))).toFloat), 0L))
    val df = rows.toDF("embedding", "vec_id")
    val m = Pca.fit(df, "embedding", k = 4)
    // full-rank rotation preserves centered norms
    val both = Pca.transform(df, "embedding", m, "p")
      .select(F.col("embedding").cast("array<double>").as("e"), F.col("p"))
      .collect()
    both.foreach { r =>
      val e = r.getSeq[Double](0).toArray
      val centered = e.zip(m.mean).map { case (x, mu) => x - mu }
      val p = r.getSeq[Double](1).toArray
      assert(math.abs(dot(centered, centered) - dot(p, p)) < 1e-9)
    }
    val white = Pca.transform(df, "embedding", m, "w", whiten = true)
    (0 until 4).foreach { j =>
      val xs = white.select(F.col("w")(j)).as[Double].collect()
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(v - 1.0) < 1e-6, s"whitened var axis $j = $v")
    }
  }

  test("fit is invariant to partitioning; nulls skipped; ragged input rejected") {
    val rows = Seq.tabulate(50)(i => (Seq.tabulate(3)(j => (i * (j + 1)).toFloat), i.toLong))
    val df1 = rows.toDF("embedding", "vec_id")
    val df8 = df1.repartition(8)
    val m1 = Pca.fit(df1, "embedding", 2)
    val m8 = Pca.fit(df8, "embedding", 2)
    m1.mean.zip(m8.mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    m1.components.flatMap(_.toSeq).zip(m8.components.flatMap(_.toSeq)).foreach {
      case (a, b) => assert(math.abs(a - b) < 1e-7)
    }
    val withNull = df1.withColumn("embedding",
      F.when(F.col("vec_id") === 3, F.lit(null)).otherwise(F.col("embedding")))
    assert(Pca.fit(withNull, "embedding", 1).d == 3) // null row skipped, not crashed
    val ragged = Seq((Seq(1f, 2f), 0L), (Seq(1f, 2f, 3f), 1L)).toDF("embedding", "vec_id")
    // one partition -> the executor-side require fires; multiple partitions
    // hit the driver-side combine require instead — accept either
    val ex = intercept[Exception](Pca.fit(ragged.coalesce(1), "embedding", 1))
    assert(ex.getMessage.contains("ragged") || ex.getCause != null)
  }
}

package graft.ml

import org.apache.spark.sql.{DataFrame, functions => F}

/** PCA / whitening over an embedding column (beyond-reference; the standard
  * dimensionality-reduction / decorrelation step before clustering,
  * SemDeDup, or ANN indexing of a corpus's embeddings).
  *
  * Scale shape: `fit` is ONE pass — each partition accumulates the d-vector
  * sum and the d×d outer-product sum locally in primitive arrays, and the
  * partials merge pairwise through `treeReduce` so the DRIVER receives one
  * (d² + d)-double accumulator regardless of partition count (at 100 TB /
  * 128 MB splits that's ~800k partitions; a flat collect of per-partition
  * rows would ship tens of GB to the driver — the tree keeps it O(d²)).
  * Driver state is the d×d covariance (d = a few hundred at most for
  * embedding columns; 64-dim → 32 KB). The eigendecomposition runs on the
  * driver
  * (cyclic Jacobi on the symmetric covariance — exact for this size, no
  * library dependency). `transform` is pure column arithmetic: per component
  * one zip_with + aggregate dot product over the centered vector, all
  * codegen'd HOFs, no UDF, no shuffle.
  */
object Pca {

  /** k principal components of a d-dim embedding column.
    * `components(j)` is the j-th eigenvector (unit norm, largest-|entry|
    * coordinate forced positive for sign determinism), `variance(j)` its
    * eigenvalue (population covariance, ddof = 0), sorted descending. */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         variance: Array[Double]) {
    def d: Int = mean.length
    def k: Int = components.length
  }

  /** One-pass moment accumulator: count, d-vector sum, row-major d×d
    * outer-product sum. `sum == null` marks "saw no vectors yet". */
  private final case class Moments(n: Long, sum: Array[Double], outer: Array[Double])

  /** Pairwise merge; ragged dimensions across partitions (each partition
    * checks only against its own first row) must fail loudly, not
    * mis-accumulate. Mutates and returns the non-null side. */
  private def mergeMoments(a: Moments, b: Moments): Moments = {
    if (a.sum == null) b
    else if (b.sum == null) a
    else {
      require(a.sum.length == b.sum.length,
        s"pca: ragged embedding across partitions (${b.sum.length} vs ${a.sum.length})")
      var i = 0
      while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      i = 0
      while (i < a.outer.length) { a.outer(i) += b.outer(i); i += 1 }
      Moments(a.n + b.n, a.sum, a.outer)
    }
  }

  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    // partition-local accumulation into primitive arrays, then treeReduce so
    // the driver sees ONE (d²+d)-double accumulator at any partition count
    val total = df.select(vecCol).rdd.mapPartitions { it =>
      var n = 0L
      var sum: Array[Double] = null
      var outer: Array[Double] = null // row-major d*d
      it.foreach { row =>
        val v = row.getSeq[Float](0)
        if (v != null) {
          val d = v.length
          if (sum == null) { sum = new Array[Double](d); outer = new Array[Double](d * d) }
          require(v.length == sum.length, s"pca: ragged embedding ($d vs ${sum.length})")
          n += 1
          var i = 0
          while (i < d) {
            val vi = v(i).toDouble
            sum(i) += vi
            var j = 0
            while (j < d) { outer(i * d + j) += vi * v(j).toDouble; j += 1 }
            i += 1
          }
        }
      }
      Iterator.single(Moments(n, sum, outer))
    }.treeReduce(mergeMoments _, depth = 2)
    require(total.sum != null, "pca: no non-null vectors")
    val d = total.sum.length
    val n = total.n
    val sum = total.sum
    val outer = total.outer
    require(n > 1, "pca: need at least 2 vectors")
    val mean = sum.map(_ / n)
    // population covariance: E[xxT] - mean meanT
    val cov = Array.tabulate(d, d)((i, j) => outer(i * d + j) / n - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { i =>
      val v = vectors.map(_(i))
      // sign determinism: the largest-|entry| coordinate is positive
      val pivot = v.indices.maxBy(j => math.abs(v(j)))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, comps, order.map(values).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors in COLUMNS). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    val off0 = offDiag(a)
    // RELATIVE tolerance: an absolute 1e-11 never converges for large-scale
    // covariances (double precision floors at ~1e-16 * ||A||), which would
    // burn all 100 O(d^3) sweeps on the driver for unnormalized embeddings
    val tol = 1e-12 * math.max(1.0, off0)
    var off = off0
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sign(0) must be +1: theta = 0 is the balanced 2x2 needing a
            // 45-degree rotation, and signum would zero it out entirely
            val sgn = if (theta >= 0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Project onto the model's components: adds `outCol` = array<double> of
    * length k (optionally whitened: each coordinate divided by sqrt of its
    * component variance, giving unit-variance decorrelated outputs). Pure
    * HOF arithmetic on a broadcast-literal matrix — no shuffle, no UDF. */
  def transform(df: DataFrame, vecCol: String, model: Model,
                outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val meanLit = F.array(model.mean.map(F.lit).toIndexedSeq: _*)
    val centered = F.zip_with(F.col(vecCol).cast("array<double>"), meanLit, (a, b) => a - b)
    val projections = model.components.zipWithIndex.map { case (comp, j) =>
      val compLit = F.array(comp.map(F.lit).toIndexedSeq: _*)
      val dot = F.aggregate(F.zip_with(centered, compLit, (a, b) => a * b),
        F.lit(0.0), (acc, x) => acc + x)
      if (whiten) dot / math.sqrt(math.max(model.variance(j), 1e-300)) else dot
    }
    df.withColumn(outCol, F.array(projections.toIndexedSeq: _*))
  }

  /** The model as frames for staging/inspection: (component, dim, weight)
    * rows plus (dim, mean) rows plus (component, variance) rows. */
  def modelFrames(spark: org.apache.spark.sql.SparkSession, model: Model)
      : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val comps = for {
      (c, j) <- model.components.zipWithIndex.toSeq
      (w, i) <- c.zipWithIndex
    } yield (j, i, w)
    val means = model.mean.zipWithIndex.toSeq.map { case (m, i) => (i, m) }
    val vars = model.variance.zipWithIndex.toSeq.map { case (v, j) => (j, v) }
    (comps.toDF("component", "dim", "weight"),
      means.toDF("dim", "mean"),
      vars.toDF("component", "variance"))
  }
}

package graft.ml

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Distributed clustering over embedding columns — the curation shapes that
  * need a partition of the corpus rather than a search structure: k-means
  * (Lloyd's, fully distributed) and SemDeDup-style semantic deduplication
  * (cluster, then near-dup removal WITHIN clusters — Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540).
  *
  * Scale shape of the fit: centroids are bounded MODEL STATE (k×dim doubles,
  * broadcast into the assignment expression as literals — same discipline as
  * [[Similarity.pqTrain]] codebooks). Each Lloyd's iteration is ONE
  * hash-aggregate over (cluster, dim) cells: posexplode feeds partial
  * aggregation, so the shuffle carries at most k×dim rows PER MAP TASK
  * regardless of corpus size, and the driver collects exactly k×dim cells to
  * rebuild the literals. No per-row driver traffic, no data-sized state —
  * the classic scalable k-means layout.
  */
object Clustering {

  private def centroidLit(c: Array[Double]): Column = F.array(c.map(F.lit): _*)

  /** Squared L2 distance of a vector column to a literal centroid. */
  private def sqDistLit(v: Column, c: Array[Double]): Column =
    Similarity.l2DistanceSq(v, centroidLit(c))

  /** Deterministic init: the k hash-smallest DISTINCT vectors (the
    * [[Similarity.sampleCentroids]] discipline — reproducible across runs
    * and cluster layouts, no RNG state). Distinct matters: duplicate seeds
    * would start two identical centroids, one of which never attracts a
    * point (first-index argmin tiebreak) and stays frozen by the
    * empty-cluster rule — k effective clusters silently degrade to fewer.
    * The distinct shuffle is fit-time only and capped by limit(k). */
  private def initCentroids(vecs: DataFrame, k: Int, seed: Long): Array[Array[Double]] =
    vecs.distinct()
      .orderBy(F.xxhash64(F.col("__v__").cast("string"), F.lit(seed)))
      .limit(k).collect().map(_.getSeq[Double](0).toArray)

  /** Lloyd's k-means fit. Returns centroids(k)(dim) — bounded model state.
    *
    * Per iteration: assignment is a codegen'd argmin over the k literal
    * centroid distances (each distance computed once into an array column);
    * the update is `posexplode → groupBy(cluster, dim).agg(sum, count)` —
    * partial aggregation bounds the shuffle at k×dim rows per map task, and
    * the driver collect is exactly k×dim cells. Empty clusters keep their
    * previous centroid (the [[Similarity.pqTrain]] rule). Stops when the max
    * centroid movement (L2) drops to `tol`, or after `maxIter` rounds —
    * convergence checks are driver-side scalars over already-collected
    * model state, no extra jobs. */
  def kmeansFit(df: DataFrame, vecCol: String, k: Int, maxIter: Int = 20,
                tol: Double = 1e-9, seed: Long = 42): Array[Array[Double]] = {
    require(k > 0, s"kmeansFit: k must be > 0, got $k")
    require(maxIter > 0, s"kmeansFit: maxIter must be > 0, got $maxIter")
    // one projected, persisted frame feeds init + every iteration
    val vecs = graft.kernel.PrepCache.persistBounded(
      df.select(F.col(vecCol).cast("array<double>").as("__v__"))
        .where(F.col("__v__").isNotNull))
    var cents = initCentroids(vecs, k, seed)
    require(cents.length == k,
      s"kmeansFit: corpus has only ${cents.length} distinct rows for k=$k")
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      val assigned = assignCol(F.col("__v__"), cents)
      // k×dim bounded aggregate: sum + count per (cluster, dimension) cell
      val cells = vecs.select(assigned.as("__c__"),
          F.posexplode(F.col("__v__")).as(Seq("__p__", "__x__")))
        .groupBy("__c__", "__p__")
        .agg(F.sum("__x__").as("__s__"), F.count(F.lit(1)).as("__n__"))
        .collect()
      val next = cents.map(_.clone()) // empty clusters keep previous centroid
      cells.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      moved = cents.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum)
      }.max
      cents = next
      iter += 1
    }
    cents
  }

  /** Argmin-centroid expression: all k distances land in ONE array column
    * (each computed once), argmin via array_position of the min — the
    * [[Similarity.ivfAssign]] shape, first-index tiebreak. */
  private def assignCol(v: Column, centroids: Array[Array[Double]]): Column = {
    val dists = F.array(centroids.map(c => sqDistLit(v, c)).toIndexedSeq: _*)
    (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
  }

  /** Assign each row to its nearest centroid: adds `clusterCol` (int). At
    * 100 TB the assigned corpus is written bucketed/partitioned by cluster
    * so every downstream within-cluster operation prunes. */
  def kmeansAssign(df: DataFrame, vecCol: String,
                   centroids: Array[Array[Double]],
                   clusterCol: String = "cluster_id"): DataFrame =
    df.withColumn(clusterCol,
      assignCol(F.col(vecCol).cast("array<double>"), centroids))

  /** Within-cluster near-duplicate candidate pairs: a self-join on the
    * cluster id (one shuffle each side), cosine-on-normalized = dot ≥
    * `threshold`, id_a < id_b. `assigned` must carry L2-NORMALIZED vectors
    * in `vecCol` ([[Similarity.l2Normalize]]) — the caller-visible contract
    * that makes dot equal cosine and halves the per-pair cost.
    *
    * Cost is Σ n_c² over cluster sizes — k is the knob: more clusters at
    * larger corpora keeps cluster populations (and the per-key join fan-out)
    * bounded; a skewed giant cluster is an AQE skew-join case, same as any
    * hot key. */
  def semanticPairs(assigned: DataFrame, vecCol: String, idCol: String,
                    threshold: Double,
                    clusterCol: String = "cluster_id"): DataFrame = {
    val a = assigned.select(F.col(clusterCol),
      F.col(idCol).as("id_a"), F.col(vecCol).as("__va__"))
    val b = assigned.select(F.col(clusterCol),
      F.col(idCol).as("id_b"), F.col(vecCol).as("__vb__"))
    a.join(b, Seq(clusterCol))
      .where(F.col("id_a") < F.col("id_b") &&
        Similarity.dot(F.col("__va__"), F.col("__vb__")) >= threshold)
      .select("id_a", "id_b")
  }

  /** SemDeDup: L2-normalize → k-means → within-cluster cosine pairs →
    * connected components → keep the min-id document of each component.
    * Returns the surviving rows of `df` (all original columns).
    *
    * The paper keeps one exemplar per ε-ball inside each cluster; composing
    * with [[Dedup.connectedComponents]] (same closure the MinHash pipeline
    * uses) makes the survivor set transitive and order-independent —
    * min-id-wins, reproducible across partition layouts. */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
                    k: Int, threshold: Double = 0.97, maxIter: Int = 20,
                    seed: Long = 42): DataFrame = {
    val norm = df.withColumn("__nv__",
      Similarity.l2Normalize(F.col(vecCol).cast("array<double>")))
    val cents = kmeansFit(norm, "__nv__", k, maxIter, seed = seed)
    val assigned = graft.kernel.PrepCache.persistBounded(
      kmeansAssign(norm, "__nv__", cents, "__cl__"))
    val pairs = semanticPairs(assigned, "__nv__", idCol, threshold, "__cl__")
    Dedup.dedupByClusters(df, idCol, pairs)
  }

  /** Inertia (sum of squared distances to the assigned centroid) — the
    * convergence/quality scalar; one narrow aggregate. */
  def inertia(df: DataFrame, vecCol: String,
              centroids: Array[Array[Double]]): Double = {
    val v = F.col(vecCol).cast("array<double>")
    val dists = F.array(centroids.map(c => sqDistLit(v, c)).toIndexedSeq: _*)
    df.select(F.sum(F.array_min(dists)).as("i")).collect()(0).getDouble(0)
  }
}

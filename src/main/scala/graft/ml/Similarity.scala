package graft.ml

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Similarity search over embedding columns (`Array[Float]`) — beyond-reference
  * LLM-pipeline operators. Dot products via `zip_with` + `aggregate` HOFs:
  * codegen'd, no UDF, no driver collect.
  */
object Similarity {

  /** Dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      F.lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column =
    F.sqrt(F.aggregate(v, F.lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Elementwise squared L2 — the shared building block (kmeans assignment,
    * centroid audits) where the sqrt would only cost monotonicity-free
    * precision. */
  def l2DistanceSq(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), F.lit(0.0), (acc, x) => acc + x)

  def l2Distance(a: Column, b: Column): Column = F.sqrt(l2DistanceSq(a, b))

  /** Brute-force cosine top-k against one query vector (the exact baseline).
    * Narrow scan + TakeOrderedAndProject — no shuffle of the corpus. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Float], k: Int = 10): DataFrame = {
    val q = F.array(query.map(x => F.lit(x)): _*)
    df.select(F.col(idCol), cosine(F.col(vecCol), q).as("cosine"))
      .orderBy(F.col("cosine").desc, F.col(idCol))
      .limit(k)
  }

  /** All-pairs brute-force top-k per left row against a (small, broadcast)
    * query set: cross-join + window. queries must fit in executor memory. */
  def topKPerQuery(corpus: DataFrame, queries: DataFrame, vecCol: String,
                   corpusId: String, queryId: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(F.broadcast(queries.select(
      F.col(queryId), F.col(vecCol).as("__qvec__"))))
      .withColumn("cosine", cosine(F.col(vecCol), F.col("__qvec__")))
    val w = Window.partitionBy(queryId).orderBy(F.col("cosine").desc, F.col(corpusId))
    joined.withColumn("__rn__", F.row_number().over(w))
      .filter(F.col("__rn__") <= k)
      .select(F.col(queryId), F.col(corpusId), F.col("cosine"), F.col("__rn__").as("rank"))
  }

  /** Deterministic centroid sample: hash-order the corpus and take the first
    * nCells vectors — reproducible across runs without driver-side RNG state. */
  def sampleCentroids(corpus: DataFrame, vecCol: String, nCells: Int,
                      seed: Long = 42): Array[Seq[Float]] =
    corpus.select(F.col(vecCol))
      .orderBy(F.xxhash64(F.col(vecCol).cast("string"), F.lit(seed)))
      .limit(nCells).collect().map(_.getSeq[Float](0))

  /** IVF-style scale path: partition the corpus into `nCells` Voronoi cells
    * around sampled centroids; a query probes only `nProbe` nearest cells.
    * Distances land in ONE array column (each computed once), argmin via
    * array_position — no expression-tree duplication. At 100 TB the corpus is
    * bucketed/written by cell_id so probes prune partitions. */
  def ivfAssign(corpus: DataFrame, vecCol: String, nCells: Int = 16, seed: Long = 42): DataFrame = {
    val centroids = sampleCentroids(corpus, vecCol, nCells, seed)
    val dists = F.array(centroids.map { c =>
      l2Distance(F.col(vecCol), F.array(c.map(x => F.lit(x)): _*))
    }.toIndexedSeq: _*)
    corpus
      .withColumn("__dists__", dists)
      .withColumn("cell_id",
        (F.array_position(F.col("__dists__"), F.array_min(F.col("__dists__"))) - 1).cast("int"))
      .drop("__dists__")
  }

  /** IVF search: rank cells for the query against the SAME deterministic
    * centroids (computed driver-side — nCells×dim floats), then brute-force
    * only the nProbe nearest cells. */
  /** Indices of the `nProbe` L2-nearest centroids to `query` — the coarse
    * probe selection every IVF search variant shares (distance ties keep
    * centroid-index order: stable sort). */
  def nearestCells(centroids: Seq[Seq[Float]], query: Seq[Double],
                   nProbe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      (math.sqrt(c.zip(query).map { case (a, b) =>
        val t = a.toDouble - b; t * t }.sum), i)
    }.sortBy(_._1).take(nProbe).map(_._2)

  def ivfTopK(assigned: DataFrame, vecCol: String, idCol: String,
              query: Seq[Float], nProbe: Int = 4, k: Int = 10,
              nCells: Int = 16, seed: Long = 42): DataFrame = {
    val centroids = sampleCentroids(assigned, vecCol, nCells, seed)
    val probeCells = nearestCells(centroids.toSeq, query.map(_.toDouble), nProbe)
    val q = F.array(query.map(x => F.lit(x)): _*)
    assigned.filter(F.col("cell_id").isin(probeCells: _*))
      .select(F.col(idCol), cosine(F.col(vecCol), q).as("cosine"))
      .orderBy(F.col("cosine").desc, F.col(idCol))
      .limit(k)
  }

  /** Unit-normalize a vector column (zero vectors pass through as zeros, not
    * NaN — guarded denominator). After normalization, cosine = dot, which
    * halves the per-pair cost of every downstream similarity join. */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    // the row scalar must be computed ONCE per row — an aggregate captured
    // inside a transform lambda re-evaluates per ELEMENT (O(d^2) per row;
    // the measured pitfall documented at Dedup.shingles / QualityFilters);
    // zip_with against array_repeat(scalar, d) evaluates it once
    F.when(n === 0.0, F.transform(v, _ => F.lit(0.0)))
      .otherwise(F.zip_with(v, F.array_repeat(n, F.size(v)),
        (x, nn) => x.cast("double") / nn))
  }

  /** Symmetric per-vector int8 scalar quantization: scale = 127 / max|x|,
    * q_i = floor(x_i * scale + 0.5) (explicit floor+0.5 so the rounding rule
    * is engine-agnostic — SQL `round` half-away vs half-even differs across
    * engines). Returns a struct of the codes and the dequantization scale.
    * 4× memory cut for ANN shortlists; exact enough for recall-then-rerank. */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = F.aggregate(v, F.lit(0.0),
      (acc, x) => F.greatest(acc, F.abs(x.cast("double"))))
    val scale = F.when(maxAbs === 0.0, 1.0).otherwise(F.lit(127.0) / maxAbs)
    F.struct(
      F.zip_with(v, F.array_repeat(scale, F.size(v)),
        (x, sc) => F.floor(x.cast("double") * sc + 0.5).cast("int")).as("codes"),
      scale.as("scale"))
  }

  // ---- product quantization (PQ) — the memory-scale ANN path beyond IVF:
  // a d-dim vector becomes m sub-codes into per-subspace codebooks of k
  // centroids (m bytes instead of 4d). Codebooks are MODEL STATE (m*k*dsub
  // doubles): trained driver-side on a bounded deterministic sample, applied
  // executor-side as literal expressions — the corpus never leaves the
  // executors, queries search via an ADC lookup table. ----

  /** Train per-subspace codebooks with Lloyd's k-means on a deterministic
    * hash-ordered sample (same discipline as [[sampleCentroids]] — no RNG
    * state, reproducible across runs). Empty clusters keep their previous
    * centroid. Returns codebooks(m)(k)(dsub). */
  def pqTrain(corpus: DataFrame, vecCol: String, m: Int, k: Int = 16,
              iters: Int = 10, sampleSize: Int = 2048, seed: Long = 42): Array[Array[Array[Double]]] = {
    val sample = corpus.select(F.col(vecCol))
      .orderBy(F.xxhash64(F.col(vecCol).cast("string"), F.lit(seed)))
      .limit(sampleSize).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "pqTrain: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      val sub = sample.map(_.slice(j * dsub, (j + 1) * dsub))
      var cents = Array.tabulate(k)(i => sub(i * sub.length / k).clone())
      for (_ <- 0 until iters) {
        val assign = sub.map { v =>
          var best = 0; var bd = Double.MaxValue
          for (c <- 0 until k) {
            var d = 0.0; var t = 0
            while (t < dsub) { val x = v(t) - cents(c)(t); d += x * x; t += 1 }
            if (d < bd) { bd = d; best = c }
          }
          best
        }
        cents = Array.tabulate(k) { c =>
          val members = sub.indices.filter(assign(_) == c)
          if (members.isEmpty) cents(c)
          else Array.tabulate(dsub)(t => members.map(i => sub(i)(t)).sum / members.size)
        }
      }
      cents
    }
  }

  /** Encode each vector as m sub-codes (argmin centroid per subspace) —
    * one codegen'd expression over literal centroids, no UDF. */
  def pqEncode(df: DataFrame, vecCol: String, idCol: String,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length; val dsub = codebooks(0)(0).length
    val codeCols = (0 until m).map { j =>
      val sub = F.slice(F.col(vecCol), j * dsub + 1, dsub)
      val dists = F.array(codebooks(j).map { c =>
        F.aggregate(
          F.zip_with(sub, F.array(c.map(F.lit): _*), (x, y) => {
            val d = x.cast("double") - y; d * d
          }),
          F.lit(0.0), (acc, x) => acc + x)
      }: _*)
      (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    }
    df.select(F.col(idCol), F.array(codeCols: _*).as("codes"))
  }

  /** Asymmetric-distance lookup table for one query: lut(j)(c) = squared L2
    * between the query's j-th subvector and centroid c. Driver-side (m*k
    * doubles of model state). */
  def pqLut(query: Seq[Double], codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val m = codebooks.length; val dsub = codebooks(0)(0).length
    require(query.length == m * dsub, s"pqLut: query dim ${query.length} != ${m * dsub}")
    Array.tabulate(m) { j =>
      val q = query.slice(j * dsub, (j + 1) * dsub)
      codebooks(j).map(c => c.zip(q).map { case (a, b) => val d = a - b; d * d }.sum)
    }
  }

  /** ADC distance of each coded vector to the query: gather the m lut cells
    * named by the codes and sum — a fold over literal arrays, O(m) per row,
    * never touching the original vectors. */
  def pqAdcDistance(codes: Column, lut: Array[Array[Double]]): Column = {
    val lutCol = F.array(lut.map(row => F.array(row.map(F.lit): _*)): _*)
    F.sqrt(F.aggregate(
      F.zip_with(codes, lutCol, (code, row) => F.element_at(row, code + 1)),
      F.lit(0.0), (acc, x) => acc + x))
  }

  /** PQ top-k: smallest ADC distance to the query — TakeOrderedAndProject
    * over the codes frame, no shuffle of the corpus. */
  def pqTopK(codesDf: DataFrame, idCol: String, lut: Array[Array[Double]],
             k: Int = 10): DataFrame =
    codesDf.select(F.col(idCol), pqAdcDistance(F.col("codes"), lut).as("dist"))
      .orderBy(F.col("dist").asc, F.col(idCol))
      .limit(k)

  /** Two-stage ANN search — the production recall/precision split: a COARSE
    * shortlist by PQ ADC distance within the query's probed IVF cells
    * (touches only codes, m ints/row, partition-pruned by cell at scale),
    * then an EXACT cosine re-rank of the `shortlist` survivors against
    * their full vectors. Both ranks order on the 6-dp-rounded score with an
    * id tiebreak so the selected sets are reproducible across engines.
    *
    * `cells` is an [[ivfAssign]] output (id, vec, cell_id); `codes` a
    * [[pqEncode]] output. At 100 TB the codes table is the small resident
    * index (bucketed by cell_id), the vector table is cold storage touched
    * `shortlist` rows at a time — exactly this plan's join order. */
  def ivfPqReRank(cells: DataFrame, codes: DataFrame, idCol: String,
                  vecCol: String, probeCells: Seq[Int], query: Seq[Double],
                  lut: Array[Array[Double]], shortlist: Int = 50,
                  k: Int = 10): DataFrame = {
    val cand = cells.filter(F.col("cell_id").isin(probeCells: _*))
      .join(codes, Seq(idCol))
    val short = cand
      .select(F.col(idCol), F.col(vecCol),
        pqAdcDistance(F.col("codes"), lut).as("adc"))
      .orderBy(F.round(F.col("adc"), 6).asc, F.col(idCol))
      .limit(shortlist)
    short
      .select(F.col(idCol),
        cosine(F.col(vecCol), F.array(query.map(F.lit): _*)).as("cosine"),
        F.col("adc"))
      .orderBy(F.round(F.col("cosine"), 6).desc, F.col(idCol))
      .limit(k)
  }

  /** Cosine between two int8-quantized vectors (structs from
    * [[quantizeInt8]]): integer dot product on the codes, norms likewise —
    * the scales cancel in cosine, so no dequantization multiply at all. */
  def cosineQuantized(a: Column, b: Column): Column = {
    def qdot(x: Column, y: Column) =
      F.aggregate(F.zip_with(x, y, (p, q) => (p * q).cast("long")),
        F.lit(0L), (acc, t) => acc + t).cast("double")
    qdot(a.getField("codes"), b.getField("codes")) /
      (F.sqrt(qdot(a.getField("codes"), a.getField("codes"))) *
        F.sqrt(qdot(b.getField("codes"), b.getField("codes"))))
  }
}

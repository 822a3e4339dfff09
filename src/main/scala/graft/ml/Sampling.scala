package graft.ml

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, functions => F}

/** Corpus sampling strategies for training-data pipelines (beyond-reference):
  * stratified and hash-based sampling with exact, reproducible semantics.
  */
object Sampling {

  /** Exact stratified sample: for each stratum value, keep the first
    * `ceil(frac * stratum_count)` rows in `orderCol` order. Deterministic and
    * engine-reproducible (no RNG) — the shape used for fixed-seed ablations
    * and for the DuckDB oracle. One window shuffle keyed by stratum.
    * The threshold is IEEE-double `ceil(frac * n)` on purpose — the same
    * arithmetic SQL `ceil(n * frac)` computes — so a fraction whose product
    * rounds up a hair (0.07 * 100 = 7.000000000000001 → 8) reproduces
    * bit-for-bit against the oracle rather than against idealized decimal
    * math. Pass an exact binary fraction (k / 2^m) when the mathematical
    * count matters. */
  def stratifiedExact(df: DataFrame, stratumCol: String, frac: Double,
                      orderCol: String): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    val w = Window.partitionBy(F.col(stratumCol)).orderBy(F.col(orderCol))
    df.withColumn("__rn__", F.row_number().over(w))
      .withColumn("__n__", F.count(F.lit(1)).over(Window.partitionBy(F.col(stratumCol))))
      .filter(F.col("__rn__") <= F.ceil(F.col("__n__") * frac))
      .drop("__rn__", "__n__")
  }

  /** Deterministic train/val/test split: each row's bucket is the first two
    * hex digits of md5(seed:id), compared against cumulative weight
    * boundaries quantized to 1/256ths. Zero shuffle and zero coordination —
    * any executor assigns any row identically, so the split is stable under
    * reruns, repartitioning and incremental appends (a new document joins
    * the same split forever), which is what leak-free held-out sets at
    * 100 TB require. The hex-string compare makes the assignment exactly
    * reproducible in any engine with md5 (no engine-specific hash). Weights
    * are normalized; each split's expected share is its quantized weight. */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[Double] = Seq(0.8, 0.1, 0.1),
                names: Seq[String] = Seq("train", "val", "test"),
                seed: String = "graft", splitCol: String = "split"): DataFrame = {
    require(weights.size == names.size && weights.nonEmpty, "weights/names must align")
    require(weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w / total * 256).toInt)
    require(cum.dropRight(1).forall(c => c > 0 && c < 256) &&
      cum.zip(0 +: cum).forall { case (hi, lo) => hi > lo },
      s"weights quantize to empty/full buckets at 1/256 granularity: $cum")
    val bucket = F.substring(
      F.md5(F.concat_ws(":", F.lit(seed), F.col(idCol).cast("string"))), 1, 2)
    val assigned = names.dropRight(1).zip(cum).foldRight(F.lit(names.last)) {
      case ((name, bound), rest) =>
        F.when(bucket < F.lit(f"$bound%02x"), F.lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Hash-threshold sample: keep rows where the seeded xxhash64 of the key
    * lands below `frac` of the hash space. Stateless, no shuffle, stable
    * under reruns and across partitionings — the 100 TB-scale default (each
    * executor decides locally; expected fraction `frac` per stratum). */
  def hashSample(df: DataFrame, keyCol: String, frac: Double,
                 seed: Long = 42): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0, 1], got $frac")
    // map hash to [0,1) through the unsigned 64-bit space
    val u = (F.xxhash64(F.lit(seed), F.col(keyCol)).cast("decimal(20,0)")
      + F.lit(BigDecimal("9223372036854775808"))) / F.lit(BigDecimal("18446744073709551616"))
    df.filter(u < frac)
  }

  /** Temperature-scaled stratum sampling — the multilingual / multi-domain
    * data-mixing shape: target shares ∝ n_stratum^alpha, so alpha = 1 keeps
    * the natural mix and alpha → 0 flattens toward uniform (the mT5/XLM-R
    * recipe; alpha = 0.5 = sqrt scaling, which Spark and SQL both compute
    * IEEE-exactly). Per stratum the target count is
    * round(targetRows · n^alpha / Σ n^alpha) capped at n (downsampling
    * only — no replacement), and the kept rows are the target-count
    * smallest by seeded hash of `idCol`: deterministic, engine-reproducible
    * selection (rank over the hash, not a threshold — counts are EXACT, and
    * the same hash column can be staged for an independent re-derivation).
    *
    * Scale shape: one aggregate for the stratum table (tiny — one row per
    * stratum, broadcast back) + one window shuffle keyed by stratum for the
    * rank. Skewed strata rank within their own partitions only. */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        targetRows: Long, alpha: Double = 0.5,
                        seed: Long = 42): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetRows > 0, s"targetRows must be > 0, got $targetRows")
    val counts = df.groupBy(F.col(stratumCol))
      .agg(F.count(F.lit(1)).as("__n__"))
      .withColumn("__wt__", F.pow(F.col("__n__"), alpha))
      .withColumn("__t__",
        F.least(F.col("__n__"),
          F.round(F.lit(targetRows.toDouble) * F.col("__wt__") /
            F.sum("__wt__").over(Window.partitionBy()), 0).cast("long")))
      .select(stratumCol, "__t__")
    val hv = F.xxhash64(F.lit(seed), F.col(idCol))
    val w = Window.partitionBy(F.col(stratumCol)).orderBy(hv, F.col(idCol))
    // null-SAFE join: groupBy above counts a null stratum as a real group
    // (its weight is in the denominator), so the join-back must match it
    // too — a plain using-join would silently drop every null-stratum row
    val countsR = counts.withColumnRenamed(stratumCol, "__s__")
    df.join(F.broadcast(countsR), df(stratumCol) <=> countsR("__s__"))
      .withColumn("__rn__", F.row_number().over(w))
      .filter(F.col("__rn__") <= F.col("__t__"))
      .drop("__rn__", "__t__", "__s__")
  }

  /** Hashed word-n-gram feature buckets for one document: each n-gram hashes
    * to one of `buckets` cells via seeded xxhash64 — the DSIR featurization
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling", arXiv:2302.03169). Returns (idCol, bucket, cnt) — one row
    * per document × occupied bucket, built with one explode + one
    * hash-aggregate (map-side combine keeps the shuffle at occupied-bucket
    * granularity). */
  def hashedNgramBuckets(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 2, buckets: Int = 4096,
                         seed: Long = 42): DataFrame = {
    require(n >= 1, s"hashedNgramBuckets: n must be >= 1, got $n")
    require(buckets > 0, s"hashedNgramBuckets: buckets must be > 0, got $buckets")
    val toks = TextAnalysis.tokens(F.col(textCol))
    val grams = if (n == 1) toks else QualityFilters.wordNgramsFromWords(toks, n)
    df.select(F.col(idCol), F.explode(grams).as("__g__"))
      .select(F.col(idCol),
        F.pmod(F.xxhash64(F.lit(seed), F.col("__g__")), F.lit(buckets.toLong))
          .cast("int").as("bucket"))
      .groupBy(idCol, "bucket").agg(F.count(F.lit(1)).as("cnt"))
  }

  /** DSIR importance log-weights: score each raw document by how much more
    * likely its hashed-n-gram features are under the TARGET distribution
    * than under the RAW distribution —
    * logw(d) = Σ_b n_d(b) · (ln p̂_t(b) − ln p̂_r(b)), with add-1-smoothed
    * bucket probabilities p̂(b) = (c(b)+1)/(total+B). High-weight documents
    * look like the target domain; [[dsirResample]] then draws the corpus
    * subset.
    *
    * `rawBuckets` / `targetBuckets` are (id, bucket, cnt) frames from
    * [[hashedNgramBuckets]] (same n/buckets/seed — caller's contract). A
    * feature bucket at or beyond `buckets` fails fast (assert inside the
    * ≤ B-row ratio table — features built with MORE buckets than B are a
    * contract violation that would otherwise silently skew every weight;
    * the fewer-buckets direction is undetectable and stays on the caller).
    * Returns (idCol, logwCol), one row per raw id present in `rawBuckets`.
    *
    * Scale shape: the two distribution tables aggregate to ≤ B rows each and
    * broadcast into the per-doc join; the per-doc score is one
    * hash-aggregate over the raw bucket rows. Totals ride along as scalars
    * inside the broadcast table — no driver-side model state at all. */
  def dsirLogWeights(rawBuckets: DataFrame, targetBuckets: DataFrame,
                     idCol: String, buckets: Int = 4096,
                     logwCol: String = "dsir_logw"): DataFrame = {
    def dist(b: DataFrame) = b.groupBy("bucket").agg(F.sum("cnt").as("c"))
    val raw = dist(rawBuckets); val tgt = dist(targetBuckets)
    // full outer on bucket: a bucket empty on one side still contributes its
    // smoothed probability
    val ratio = raw.select(F.col("bucket"), F.col("c").as("cr"))
      .join(tgt.select(F.col("bucket"), F.col("c").as("ct")), Seq("bucket"), "full")
      .select(F.col("bucket"),
        F.coalesce(F.col("cr"), F.lit(0L)).as("cr"),
        F.coalesce(F.col("ct"), F.lit(0L)).as("ct"))
    val totals = ratio.agg(F.sum("cr").as("tr"), F.sum("ct").as("tt"))
    val b = F.lit(buckets.toDouble)
    val withLr = ratio.crossJoin(F.broadcast(totals))
      .where(F.assert_true(F.col("bucket") < buckets,
        F.lit(s"dsirLogWeights: feature bucket >= buckets=$buckets — the " +
          "input frames were built with a larger bucket count")).isNull)
      .select(F.col("bucket"),
        (F.log((F.col("ct") + 1.0) / (F.col("tt") + b)) -
         F.log((F.col("cr") + 1.0) / (F.col("tr") + b))).as("__lr__"))
    rawBuckets.join(F.broadcast(withLr), Seq("bucket"))
      .groupBy(idCol)
      .agg(F.sum(F.col("cnt") * F.col("__lr__")).as(logwCol))
  }

  /** DSIR selection: importance resampling without replacement via the
    * Gumbel-top-n trick — key(d) = logw(d) + Gumbel(0,1), take the n largest
    * keys. The Gumbel draw is derived from a seeded hash of the id
    * (u = (h + 2⁶³ + 0.5) / 2⁶⁴, g = −ln(−ln u)) so selection is
    * deterministic and partition-layout-independent. One
    * TakeOrderedAndProject at scale — no full sort. */
  def dsirResample(weights: DataFrame, idCol: String, n: Int,
                   logwCol: String = "dsir_logw",
                   seed: Long = 42): DataFrame = {
    require(n > 0, s"dsirResample: n must be > 0, got $n")
    val u = (F.xxhash64(F.lit(seed), F.col(idCol)).cast("decimal(20,0)") +
      F.lit(BigDecimal("9223372036854775808.5"))) /
      F.lit(BigDecimal("18446744073709551616"))
    val gumbel = -F.log(-F.log(u.cast("double")))
    weights.withColumn("__key__", F.col(logwCol) + gumbel)
      .orderBy(F.col("__key__").desc, F.col(idCol))
      .limit(n)
      .drop("__key__")
  }

  /** Per-stratum target-count downsampling ("data mixing"): given a map of
    * stratum -> target row count, keep the first `target` rows per stratum in
    * `orderCol` order (strata absent from the map are kept whole). The
    * building block for rebalancing domain/language mixes. */
  def capPerStratum(df: DataFrame, stratumCol: String,
                    targets: Map[String, Long], orderCol: String): DataFrame = {
    val w = Window.partitionBy(F.col(stratumCol)).orderBy(F.col(orderCol))
    val targetCol = targets.foldLeft(F.lit(Long.MaxValue)) { case (acc, (k, v)) =>
      F.when(F.col(stratumCol) === k, v).otherwise(acc)
    }
    df.withColumn("__rn__", F.row_number().over(w))
      .filter(F.col("__rn__") <= targetCol)
      .drop("__rn__")
  }
}

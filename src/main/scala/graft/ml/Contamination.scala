package graft.ml

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Benchmark-contamination detection (beyond-reference): flag training
  * documents sharing word n-grams with an evaluation/benchmark set — the
  * standard decontamination step for LLM training corpora (GPT-3 appendix C /
  * PaLM-style 13-gram overlap, scaled down to the corpus at hand).
  *
  * Spark-first: distinct word n-grams per side, inner equi-join on the gram
  * (the benchmark side is usually tiny → Catalyst broadcasts it), per-doc
  * aggregation of overlap counts. Linear in corpus size; the gram join key
  * shuffles only matching grams.
  */
object Contamination {

  /** Distinct word n-grams per document, one row per (id, gram). The words
    * array is projected before the n-gram lambda so the regex split runs
    * once per document, not once per gram (see
    * [[QualityFilters.wordNgramsFromWords]]). */
  def docNgrams(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(F.col(idCol), QualityFilters.words(F.col(textCol)).as("__ws__"))
      .select(F.col(idCol),
        F.explode(F.array_distinct(
          QualityFilters.wordNgramsFromWords(F.col("__ws__"), n))).as("gram"))

  /** Per-training-doc contamination report against `bench`:
    * `n_overlap` distinct shared grams, `n_bench_docs` distinct benchmark
    * documents hit, and the total distinct gram count for a ratio.
    * Training docs with no overlap are kept with zeros (left join). */
  def ngramOverlap(train: DataFrame, bench: DataFrame,
                   textCol: String, idCol: String, n: Int = 3): DataFrame = {
    // Single pass: explode each side once, LEFT-join train grams to the
    // (broadcast) benchmark grams, then one aggregation. A matched gram
    // appears once per matching bench doc, so every count is a distinct —
    // that costs one Expand (×3 rows) but avoids recomputing the regexp
    // split + n-gram build for a second totals branch, which dominates.
    val tg = docNgrams(train, textCol, idCol, n)
    val bg = docNgrams(bench, textCol, idCol, n)
      .withColumnRenamed(idCol, "__bench_id__")
    tg.join(F.broadcast(bg), Seq("gram"), "left")
      .groupBy(F.col(idCol))
      .agg(
        F.countDistinct(F.col("gram")).as("n_grams"),
        F.countDistinct(F.when(F.col("__bench_id__").isNotNull, F.col("gram")))
          .as("n_overlap"),
        F.countDistinct(F.col("__bench_id__")).as("n_bench_docs"))
      .select(F.col(idCol), F.col("n_grams"), F.col("n_overlap"),
        F.col("n_bench_docs"),
        (F.col("n_overlap").cast("double") / F.col("n_grams").cast("double"))
          .as("overlap_ratio"))
  }

  /** Decontaminate: drop training docs whose overlap ratio is at or above
    * `maxOverlapRatio` (anti-join against the flagged set). */
  def decontaminate(train: DataFrame, bench: DataFrame, textCol: String,
                    idCol: String, n: Int = 3,
                    maxOverlapRatio: Double = 0.05): DataFrame = {
    val flagged = ngramOverlap(train, bench, textCol, idCol, n)
      .filter(F.col("overlap_ratio") >= maxOverlapRatio)
      .select(F.col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Bloom-filter candidate pre-filter — the 100 TB shape of decontamination.
    * The benchmark's distinct grams (millions, not billions) compress into a
    * driver-built Bloom filter that is broadcast to every executor; each
    * training doc is kept as a CANDIDATE only if some gram hits the filter.
    * False positives are possible (tune `fpp`), false negatives are not, so
    * `ngramOverlap` run on the (tiny) candidate set gives the exact answer
    * without ever shuffling the full corpus' grams.
    *
    * Membership has no builtin SQL expression, so this is one of the rare
    * justified closure filters — it runs against a broadcast value, keeps
    * pushdown on every earlier stage, and touches each doc once. */
  def bloomCandidates(train: DataFrame, bench: DataFrame, textCol: String,
                      idCol: String, n: Int = 3,
                      fpp: Double = 0.01): DataFrame = {
    // persist: count() and bloomFilter() are two jobs over the gram frame —
    // without it the bench-side explode runs twice
    val bg = docNgrams(bench, textCol, idCol, n).persist()
    val expected = math.max(bg.count(), 1L)
    val bloom = bg.stat.bloomFilter("gram", expected, fpp)
    bg.unpersist(blocking = false)
    val bcast = train.sparkSession.sparkContext.broadcast(bloom)
    val hit = F.udf((grams: Seq[String]) =>
      grams != null && grams.exists(bcast.value.mightContainString))
    train
      .withColumn("__ws__", QualityFilters.words(F.col(textCol)))
      .withColumn("__grams__",
        F.array_distinct(QualityFilters.wordNgramsFromWords(F.col("__ws__"), n)))
      .filter(hit(F.col("__grams__")))
      .drop("__ws__", "__grams__")
  }
}

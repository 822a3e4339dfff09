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

  /** Distinct word n-grams per document, one row per (id, gram). */
  def docNgrams(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(F.col(idCol),
      F.explode(F.array_distinct(
        QualityFilters.wordNgrams(F.col(textCol), n))).as("gram"))

  /** Per-training-doc contamination report against `bench`:
    * `n_overlap` distinct shared grams, `n_bench_docs` distinct benchmark
    * documents hit, and the total distinct gram count for a ratio.
    * Training docs with no overlap are kept with zeros (left join). */
  def ngramOverlap(train: DataFrame, bench: DataFrame,
                   textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val tg = docNgrams(train, textCol, idCol, n)
    val bg = docNgrams(bench, textCol, idCol, n)
      .withColumnRenamed(idCol, "__bench_id__")
    val hits = tg.join(F.broadcast(bg), Seq("gram"))
      .groupBy(F.col(idCol))
      .agg(F.countDistinct(F.col("gram")).as("n_overlap"),
        F.countDistinct(F.col("__bench_id__")).as("n_bench_docs"))
    val totals = tg.groupBy(F.col(idCol))
      .agg(F.count(F.lit(1)).as("n_grams"))
    totals.join(hits, Seq(idCol), "left")
      .select(F.col(idCol), F.col("n_grams"),
        F.coalesce(F.col("n_overlap"), F.lit(0L)).as("n_overlap"),
        F.coalesce(F.col("n_bench_docs"), F.lit(0L)).as("n_bench_docs"),
        (F.coalesce(F.col("n_overlap"), F.lit(0L)).cast("double") /
          F.col("n_grams").cast("double")).as("overlap_ratio"))
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
}

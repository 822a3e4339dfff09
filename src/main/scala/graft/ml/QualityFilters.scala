package graft.ml

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Gopher-style repetition / quality filter signals (beyond-reference;
  * public heuristics from Rae et al. 2021 "Scaling Language Models" §A1.1 and
  * the C4 paper — standard cleaning rules for LLM training corpora).
  *
  * Spark-first: the n-gram statistics are computed by exploding word n-grams
  * and aggregating — a shuffle keyed on (doc, gram) that scales linearly with
  * corpus size and parallelizes per document, instead of per-row lambda loops.
  * All ratios are exact IEEE divisions so results are engine-reproducible.
  */
object QualityFilters {

  /** Words of a document (whitespace split of the trimmed text). */
  def words(text: Column): Column =
    F.when(F.length(F.trim(text)) === 0, F.array().cast("array<string>"))
      .otherwise(F.split(F.trim(text), "\\s+"))

  /** Word n-grams from an already-materialized words array. IMPORTANT: pass
    * a plain column reference, not an expression tree — subexpressions inside
    * a higher-order-function lambda are re-evaluated PER ELEMENT, so handing
    * this `split(...)` directly re-runs the regex split once per n-gram
    * (measured ~50× slowdown). Project the words array first. */
  def wordNgramsFromWords(ws: Column, n: Int): Column = {
    val count = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    // sequence(0, -1) yields a DESCENDING sequence, not empty — guard count=0
    F.when(count === 0, F.array().cast("array<string>"))
      .otherwise(F.transform(F.sequence(F.lit(0), count - 1),
        i => F.array_join(F.slice(ws, i + 1, F.lit(n)), " ")))
  }

  /** Word n-grams as space-joined strings: zip-shift composition, evaluated
    * per row without a UDF. Convenience form — in hot paths project
    * [[words]] to a column first and use [[wordNgramsFromWords]] (see the
    * per-element re-evaluation note there). */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromWords(words(text), n)

  /** Fraction of words that are repeats of an earlier word in the same doc:
    * 1 - distinct/total. */
  def duplicateWordFraction(text: Column): Column = {
    val ws = words(text)
    F.when(F.size(ws) === 0, 0.0).otherwise(
      F.lit(1.0) - F.size(F.array_distinct(ws)).cast("double") / F.size(ws).cast("double"))
  }

  /** Per-document n-gram repetition signals over the corpus:
    *   - `top_ngram_char_fraction`: chars covered by the single most frequent
    *     word n-gram (count * gram length) / total chars. Ties break toward
    *     the lexicographically-smallest gram so the statistic is
    *     deterministic.
    *   - `dup_ngram_char_fraction`: chars covered by all n-grams occurring
    *     more than once (sum count*len over repeated grams) / total chars —
    *     the standard overlap-agnostic simplification of Gopher's rule.
    *
    * Implementation: posexplode n-grams -> hash-agg on (id, gram) -> per-doc
    * agg -> broadcast-join back. Two shuffles, both keyed per document, no
    * driver-side loops; documents with no n-gram (fewer than n words) get 0.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2): DataFrame = {
    val grams = df.select(F.col(idCol), F.length(F.col(textCol)).as("__chars__"),
        words(F.col(textCol)).as("__ws__"))
      .select(F.col(idCol), F.col("__chars__"),
        F.explode(wordNgramsFromWords(F.col("__ws__"), n)).as("__gram__"))
      .groupBy(F.col(idCol), F.col("__gram__"), F.col("__chars__"))
      .agg(F.count(F.lit(1)).as("__cnt__"))
    // top gram = max of the (count, gram) struct: most frequent, ties broken
    // toward the lexicographically-largest gram — a total, engine-agnostic
    // (binary-collation) order, so the statistic is deterministic.
    val perDoc = grams.groupBy(F.col(idCol))
      .agg(
        F.max(F.struct(F.col("__cnt__").as("c"), F.col("__gram__").as("g"))).as("__top__"),
        F.sum(F.when(F.col("__cnt__") > 1,
          F.col("__cnt__") * F.length(F.col("__gram__"))).otherwise(0L)).as("__dup_chars__"),
        F.first(F.col("__chars__")).as("__chars__"))
      .select(F.col(idCol),
        (F.col("__top__.c") * F.length(F.col("__top__.g"))).cast("double")
          ./(F.greatest(F.col("__chars__"), F.lit(1)).cast("double"))
          .as("top_ngram_char_fraction"),
        F.col("__dup_chars__").cast("double")
          ./(F.greatest(F.col("__chars__"), F.lit(1)).cast("double"))
          .as("dup_ngram_char_fraction"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("top_ngram_char_fraction", F.coalesce(F.col("top_ngram_char_fraction"), F.lit(0.0)))
      .withColumn("dup_ngram_char_fraction", F.coalesce(F.col("dup_ngram_char_fraction"), F.lit(0.0)))
  }

  /** Full Gopher filter over a frame: the cheap per-row predicate
    * ([[gopherKeep]]) plus the corpus-exploded repetition caps
    * ([[repetitionSignals]]). Returns only the surviving rows; set
    * `explain = true` to keep the signal columns for auditing drops. */
  def gopherFilter(df: DataFrame, textCol: String, idCol: String,
                   minWords: Int = 50, maxDupWordFraction: Double = 0.63,
                   maxTopNgramCharFraction: Double = 0.20,
                   maxDupNgramCharFraction: Double = 0.40,
                   explain: Boolean = false): DataFrame = {
    val signaled = repetitionSignals(df, textCol, idCol, n = 2)
    val kept = signaled.filter(
      gopherKeep(F.col(textCol), minWords = minWords,
        maxDupWordFraction = maxDupWordFraction) &&
        F.col("top_ngram_char_fraction") <= maxTopNgramCharFraction &&
        F.col("dup_ngram_char_fraction") <= maxDupNgramCharFraction)
    if (explain) kept
    else kept.drop("top_ngram_char_fraction", "dup_ngram_char_fraction")
  }

  /** Gopher-style keep/drop predicate from the standard thresholds (word
    * count, mean word length, symbol ratio, repetition caps). Tunable; the
    * defaults are the published paper values. */
  def gopherKeep(text: Column,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minMeanWordLen: Double = 3, maxMeanWordLen: Double = 10,
                 maxSymbolRatio: Double = 0.1,
                 maxDupWordFraction: Double = 0.63): Column = {
    val nw = F.size(words(text))
    val mwl = TextAnalysis.meanWordLength(text)
    val symRatio =
      F.size(F.regexp_extract_all(text, F.lit("[#\\.]{3,}|\\u2026"), F.lit(0))).cast("double") /
        F.greatest(nw, F.lit(1)).cast("double")
    nw.between(minWords, maxWords) &&
      mwl.between(minMeanWordLen, maxMeanWordLen) &&
      (symRatio <= maxSymbolRatio) &&
      (duplicateWordFraction(text) <= maxDupWordFraction)
  }
}

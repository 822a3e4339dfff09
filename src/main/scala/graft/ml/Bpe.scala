package graft.ml

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.kernel.BoundedCache

/** Byte-pair-encoding vocabulary induction (beyond-reference) — the
  * tokenizer-training half of a data pipeline (Sennrich et al. 2016 shape).
  *
  * Scale shape: the corpus collapses to a WORD-FREQUENCY table first (one
  * explode + hash agg — vocabulary-sized, not corpus-sized), and every
  * merge iteration is one pair-explode + hash aggregation over that table
  * plus a 1-row collect (the chosen merge — bounded model state, k rows
  * total). Merge application is a projection (no shuffle). All counts are
  * integers, so results are bit-exact across engines with no rounding.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** (word, freq) over whitespace-lowercase tokens. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(F.explode(TextAnalysis.tokens(F.col(textCol))).as("word"))
      .filter(F.col("word") =!= "")
      .groupBy("word").agg(F.count(F.lit(1)).as("freq"))

  /** Initial symbol string: characters joined by single spaces + the
    * end-of-word marker ("low" -> "l o w </w>"). */
  def initSymbols(word: Column): Column =
    F.concat_ws(" ", F.filter(F.split(word, ""), c => c =!= ""), F.lit(EndOfWord))

  /** Adjacent symbol pairs of a space-joined symbol string, as "a b". */
  private def pairsOf(sym: Column): Column = {
    val arr = F.split(sym, " ")
    F.zip_with(
      F.slice(arr, F.lit(1), F.size(arr) - 1),
      F.slice(arr, F.lit(2), F.size(arr) - 1),
      (x, y) => F.concat_ws(" ", x, y))
  }

  /** Greedy left-to-right merge of the pair (a, b) inside a symbol string,
    * via non-overlapping leftmost string replacement. Separators are
    * doubled first so adjacent occurrences ("a b a b") don't share a
    * boundary space and both merge — then collapsed back. Identical
    * `replace` semantics exist in every SQL engine, which keeps the oracle
    * mechanism-for-mechanism identical. */
  def applyMerge(sym: Column, a: String, b: String): Column = {
    val doubled = F.concat(F.lit(" "),
      F.call_function("replace", sym, F.lit(" "), F.lit("  ")), F.lit(" "))
    val merged = F.call_function("replace", doubled,
      F.lit(s" $a  $b "), F.lit(s" $a$b "))
    F.trim(F.call_function("replace", merged, F.lit("  "), F.lit(" ")))
  }

  /** Learn `numMerges` BPE merges. Ties break lexicographically on the
    * pair string (binary collation) — fully deterministic. Returns the
    * merge table (rank, lhs, rhs, pair_count) and the final word-symbol
    * table (word, sym, freq). */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = BoundedCache.persistBounded(wordFreqs(docs, textCol)
      .select(F.col("word"), initSymbols(F.col("word")).as("sym"), F.col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var prev: DataFrame = null
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      // this collect is the iteration's ONLY job: it fills the current
      // generation's cache, so the grandparent is safely released here (its
      // child is cached; no recompute) — no per-generation count() job
      val top = words
        .select(F.explode(pairsOf(F.col("sym"))).as("pair"), F.col("freq"))
        .groupBy("pair").agg(F.sum("freq").as("cnt"))
        .orderBy(F.col("cnt").desc, F.col("pair"))
        .limit(1).collect()
      if (prev != null) { BoundedCache.release(prev); prev = null }
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0); val cnt = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((r.toLong, a, b, cnt))
        val next = BoundedCache.persistBounded(
          words.withColumn("sym", applyMerge(F.col("sym"), a, b)))
        prev = words
        words = next
        r += 1
      }
    }
    if (prev != null) BoundedCache.release(prev)
    (merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count"), words)
  }

  /** Encode words with an already-learned merge list (applied in rank
    * order — the standard BPE encode). */
  def encode(words: DataFrame, wordCol: String,
             merges: Seq[(String, String)]): DataFrame =
    words.withColumn("sym",
      merges.foldLeft(initSymbols(F.col(wordCol))) {
        case (c, (a, b)) => applyMerge(c, a, b)
      })
}

package graft

import graft.ml.Bpe
import org.apache.spark.sql.{functions => F}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the Sennrich hand example") {
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (merges, words) = Bpe.learnMerges(docs, "text", numMerges = 4)
    val m = merges.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // pairs (l,o) and (o,w) tie at 5 -> lexicographic tiebreak picks "l o"
    assert(m == Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L),
      (3L, "low", "</w>", 3L), (4L, "low", "e", 2L)))
    val sym = words.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sym("low") == "low</w>")
    assert(sym("lower") == "lowe r </w>")
    assert(sym("lowest") == "lowe s t </w>")
  }

  test("merge application is greedy left-to-right on overlapping runs") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val (merges, words) = Bpe.learnMerges(docs, "text", numMerges = 2)
    val m = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // "a a a </w>": (a,a) counted twice but merges once per position sweep;
    // greedy-left leaves "aa a </w>"
    assert(m.head == ("a", "a", 2L))
    assert(m(1) == ("a", "</w>", 1L)) // "a </w>" < "aa a" lexicographically
    assert(words.collect().head.getString(1) == "aa a</w>")
  }

  test("adjacent pair occurrences both merge (no shared-boundary miss)") {
    val d = Seq(("x", "a b a b")).toDF("w", "sym").select(
      Bpe.applyMerge(F.col("sym"), "a", "b").as("out"))
    assert(d.collect().head.getString(0) == "ab ab")
  }

  test("encode with a learned merge list matches the training-time symbols") {
    val docs = Seq((1L, "banana bandana banana")).toDF("doc_id", "text")
    val (merges, words) = Bpe.learnMerges(docs, "text", numMerges = 3)
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encode(words.select("word", "freq"), "word", ms)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val trained = words.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc == trained)
  }

  test("learnMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // words "a","b" -> "a </w>", "b </w>": 2 distinct pairs at cnt 1; after
    // both merge there are no pairs left, so only 2 merges materialize
    val (merges, _) = Bpe.learnMerges(docs, "text", numMerges = 10)
    assert(merges.count() == 2)
  }
}

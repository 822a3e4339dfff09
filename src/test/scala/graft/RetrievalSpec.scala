package graft

import graft.ml.Retrieval
import org.apache.spark.sql.{functions => F}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),        // dl=3, tf(apple)=2
    (2L, "apple cherry"),              // dl=2
    (3L, "banana banana banana date"), // dl=4
    (4L, "elderberry fig")             // dl=2, shares nothing with q0
  ).toDF("doc_id", "text")

  private def bm25Ref(tf: Long, df: Long, n: Long, dl: Double, avgdl: Double,
                      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("bm25Scores matches the Okapi/Lucene formula term by term") {
    val q = Seq((0, "apple banana")).toDF("query_id", "qtext")
    val rows = Retrieval.bm25Scores(docs, "text", "doc_id", q, "query_id", "qtext")
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getLong(3))).toMap
    val avgdl = (3 + 2 + 4 + 2) / 4.0
    // apple: df=2; banana: df=2; n=4
    val d1 = bm25Ref(2, 2, 4, 3, avgdl) + bm25Ref(1, 2, 4, 3, avgdl)
    val d2 = bm25Ref(1, 2, 4, 2, avgdl)
    val d3 = bm25Ref(3, 2, 4, 4, avgdl)
    assert(rows.keySet == Set(1L, 2L, 3L)) // doc 4 shares no term
    assert(math.abs(rows(1L)._1 - d1) < 1e-12 && rows(1L)._2 == 2L)
    assert(math.abs(rows(2L)._1 - d2) < 1e-12 && rows(2L)._2 == 1L)
    assert(math.abs(rows(3L)._1 - d3) < 1e-12 && rows(3L)._2 == 1L)
  }

  test("bm25TopK ranks by rounded score with doc-id tiebreak and caps at k") {
    val q = Seq((0, "apple banana"), (1, "fig")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id", q, "query_id", "qtext", k = 2)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(4)))
    // q0: doc1 (both terms, highest) first; exactly k=2 rows
    assert(out.count(_._1 == 0) == 2)
    assert(out.filter(_._1 == 0).head._2 == 1L)
    // q1: only doc4 contains fig
    assert(out.filter(_._1 == 1).map(_._2).toSeq == Seq(4L))
    // identical docs => identical scores => tiebreak by ascending doc_id
    val twins = Seq((10L, "kiwi lime"), (11L, "kiwi lime"), (12L, "pear"))
      .toDF("doc_id", "text")
    val tq = Seq((0, "kiwi")).toDF("query_id", "qtext")
    val t = Retrieval.bm25TopK(twins, "text", "doc_id", tq, "query_id", "qtext", k = 5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(t == Seq(10L, 11L))
  }

  test("bm25 plan: query-term probe and stats joins are broadcast, no cartesian blowup") {
    val q = Seq((0, "apple banana")).toDF("query_id", "qtext")
    val plan = Retrieval.bm25Scores(docs, "text", "doc_id", q, "query_id", "qtext")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("empty and whitespace-only docs never match and never poison avgdl with phantom tokens") {
    val d = Seq((1L, "apple"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val q = Seq((0, "apple")).toDF("query_id", "qtext")
    val out = Retrieval.bm25Scores(d, "text", "doc_id", q, "query_id", "qtext").collect()
    assert(out.map(_.getLong(1)).toSet == Set(1L))
    // empty docs carry length 0 (split("") phantom filtered): avgdl = 1/3,
    // not (1+1+1)/3 — value-checked against the formula
    val avgdl = 1.0 / 3.0
    val idf = math.log(1.0 + (3.0 - 1 + 0.5) / (1 + 0.5))
    val want = idf * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 1.0 / avgdl))
    assert(math.abs(out.head.getDouble(2) - want) < 1e-12)
  }

  test("bm25Scores matches a local brute-force reference on random corpora (property)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("ant", "bee", "cat", "dog", "eel", "fox", "gnu")
    (1 to 2).foreach { trial =>
      val corpus = Seq.tabulate(12 + rnd.nextInt(8)) { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val qterms = Seq.fill(2)(vocab(rnd.nextInt(vocab.size))).distinct
      val q = Seq((0, qterms.mkString(" "))).toDF("query_id", "qtext")
      val got = Retrieval.bm25Scores(corpus.toDF("doc_id", "text"), "text", "doc_id",
          q, "query_id", "qtext")
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      // local reference
      val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      val nDocs = corpus.size.toDouble
      val avgdl = toks.values.map(_.size).sum / nDocs
      val dfq = qterms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
      val want = corpus.flatMap { case (id, _) =>
        val ts = toks(id)
        val score = qterms.filter(ts.contains).map { t =>
          val tf = ts.count(_ == t).toDouble
          val idf = math.log(1.0 + (nDocs - dfq(t) + 0.5) / (dfq(t) + 0.5))
          idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ts.size / avgdl))
        }.sum
        if (qterms.exists(ts.contains)) Some(id -> score) else None
      }.toMap
      assert(got.keySet == want.keySet, s"trial $trial doc set")
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-9, s"trial $trial doc $k") }
    }
  }

  test("hardNegatives excludes positives and re-ranks the remainder") {
    val q = Seq((0, "apple banana")).toDF("query_id", "qtext")
    val pos = Seq((0, 1L)).toDF("query_id", "doc_id") // doc 1 is the answer
    val out = Retrieval.hardNegatives(docs, "text", "doc_id",
        q, "query_id", "qtext", pos, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(4)))
    // doc 1 (the positive, highest-scoring) removed; remaining matches
    // re-ranked from 1 with no gap
    assert(!out.map(_._1).contains(1L))
    assert(out.map(_._2).toSeq == (1 to out.length).toSeq)
    assert(out.map(_._1).toSet == Set(2L, 3L))
    // empty positives = identical to bm25TopK
    val none = Seq.empty[(Int, Long)].toDF("query_id", "doc_id")
    val a = Retrieval.hardNegatives(docs, "text", "doc_id", q, "query_id", "qtext", none, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(4))).toSeq
    val b = Retrieval.bm25TopK(docs, "text", "doc_id", q, "query_id", "qtext", k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(4))).toSeq
    assert(a == b)
  }
}

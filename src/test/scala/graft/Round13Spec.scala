package graft

import graft.Polars._
import graft.api.{DataFrame, LazyFrame}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-10 pins: rolling_corr / rolling_cov (the last reference-surface
  * cell, ext/polars/src/lib.rs:575-576) — null-bearing parity against the
  * upstream composition hand-computed — plus the round's adversarial
  * sweeps: BPE encode on multi-byte text and rank-ordered repeated pairs,
  * and calendar rolling × ewm × agg composition. */
class Round13Spec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  test("rolling_cov matches the polars composition on null-bearing input") {
    // x = [1, null, 3, 4, 5], y = [2, 1, null, 2, 8], window 3, mp 2, ddof 1.
    // polars composes (E[xy] - E[x]E[y]) * n/(n-ddof) from INDEPENDENT
    // rolling means (each skipping its own nulls) plus a pair count —
    // hand-computed: rows 0-3 null (xy has <2 non-null pairs in window),
    // row 4: E[xy]=24 over {8,40}, E[x]=4 over {3,4,5}, E[y]=5 over {2,8},
    // pairs n=2 -> (24-20)*2/1 = 8.0
    val df = DataFrame(Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(2.0)), (None, Some(1.0)), (Some(3.0), None),
      (Some(4.0), Some(2.0)), (Some(5.0), Some(8.0))).toDF("x", "y"))
    val out = df.select(
      Polars.rollingCov(col("x"), col("y"), windowSize = 3, minPeriods = 2)
        .alias("c")).toSpark.collect().map(r => Option(r.get(0)))
    assert(out.take(4).forall(_.isEmpty), out.toSeq.toString)
    assert(math.abs(out(4).get.asInstanceOf[Double] - 8.0) < 1e-12)
  }

  test("rolling_corr equals per-window Pearson on null-free input, keyless and keyed") {
    val xs = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0, 6.0)
    val ys = Seq(2.0, 3.0, 7.0, 1.0, 4.0, 9.0, 5.0, 8.0)
    def pearson(px: Seq[Double], py: Seq[Double]): Double = {
      val n = px.size.toDouble
      val (mx, my) = (px.sum / n, py.sum / n)
      val cov = px.zip(py).map { case (a, b) => (a - mx) * (b - my) }.sum / (n - 1)
      val sx = math.sqrt(px.map(a => (a - mx) * (a - mx)).sum / (n - 1))
      val sy = math.sqrt(py.map(b => (b - my) * (b - my)).sum / (n - 1))
      cov / (sx / 1.0 * sy)
    }
    val expected = xs.indices.map { i =>
      if (i < 3) None
      else Some(pearson(xs.slice(i - 3, i + 1), ys.slice(i - 3, i + 1)))
    }
    val df = DataFrame(xs.zip(ys).toDF("x", "y"))
    val out = df.select(
      Polars.rollingCorr(col("x"), col("y"), windowSize = 4, minPeriods = 4)
        .alias("c")).toSpark.collect().map(r => Option(r.get(0)))
    expected.zip(out).foreach {
      case (None, got)    => assert(got.isEmpty, got.toString)
      case (Some(e), got) =>
        assert(math.abs(got.get.asInstanceOf[Double] - e) < 1e-9, s"$e vs $got")
    }
    // keyed: .over(k) computes per group over each group's row order
    val kdf = DataFrame(Seq(
      (0, "a", 1.0, 2.0), (1, "b", 10.0, 1.0), (2, "a", 4.0, 3.0),
      (3, "b", 20.0, 5.0), (4, "a", 2.0, 7.0), (5, "b", 30.0, 2.0))
      .toDF("i", "k", "x", "y"))
    val keyed = kdf.withColumn("c",
      Polars.rollingCorr(col("x"), col("y"), windowSize = 3, minPeriods = 3)
        .over(col("k")))
      .toSpark.orderBy("i").collect()
      .map(r => (r.getString(1), Option(r.get(4)))).toSeq
    val aRows = Seq((1.0, 2.0), (4.0, 3.0), (2.0, 7.0))
    val bRows = Seq((10.0, 1.0), (20.0, 5.0), (30.0, 2.0))
    def third(rows: Seq[(Double, Double)]) =
      pearson(rows.map(_._1), rows.map(_._2))
    val aGot = keyed.filter(_._1 == "a").map(_._2)
    val bGot = keyed.filter(_._1 == "b").map(_._2)
    assert(aGot.take(2).forall(_.isEmpty) && bGot.take(2).forall(_.isEmpty))
    assert(math.abs(aGot(2).get.asInstanceOf[Double] - third(aRows)) < 1e-9)
    assert(math.abs(bGot(2).get.asInstanceOf[Double] - third(bRows)) < 1e-9)
  }

  test("rolling_cov over(keys) handles nulls per group like the keyless kernel") {
    // group a = the null-bearing keyless fixture; group b pads with
    // constant-complete rows — per-group results must match the keyless
    // hand computation (row 4 of a -> 8.0), independent of interleaving
    val df = DataFrame(Seq[(Int, String, Option[Double], Option[Double])](
      (0, "a", Some(1.0), Some(2.0)), (1, "b", Some(1.0), Some(1.0)),
      (2, "a", None, Some(1.0)), (3, "b", Some(2.0), Some(2.0)),
      (4, "a", Some(3.0), None), (5, "a", Some(4.0), Some(2.0)),
      (6, "b", Some(3.0), Some(3.0)), (7, "a", Some(5.0), Some(8.0)))
      .toDF("i", "k", "x", "y"))
    val out = df.withColumn("c",
        Polars.rollingCov(col("x"), col("y"), windowSize = 3, minPeriods = 2)
          .over(col("k")))
      .toSpark.orderBy("i").collect()
      .map(r => (r.getString(1), Option(r.get(4)))).toSeq
    val a = out.filter(_._1 == "a").map(_._2)
    val b = out.filter(_._1 == "b").map(_._2)
    assert(a.take(4).forall(_.isEmpty), a.toString)
    assert(math.abs(a(4).get.asInstanceOf[Double] - 8.0) < 1e-12, a.toString)
    // b rows: perfectly correlated pairs -> cov of trailing windows
    assert(b(0).isEmpty) // single pair, below minPeriods
    assert(math.abs(b(1).get.asInstanceOf[Double] - 0.5) < 1e-12, b.toString)
    assert(math.abs(b(2).get.asInstanceOf[Double] - 1.0) < 1e-12, b.toString)
  }

  test("BPE: multi-byte characters split per code point and merge cleanly") {
    import graft.ml.Bpe
    val words = Seq("héé", "中中文").toDF("word")
    val init = words.select(Bpe.initSymbols(F.col("word")).as("sym"))
      .collect().map(_.getString(0)).toSeq
    assert(init == Seq(s"h é é ${Bpe.EndOfWord}", s"中 中 文 ${Bpe.EndOfWord}"), init)
    val merged = Bpe.encode(words, "word", Seq(("é", "é"), ("中", "中")))
      .select("sym").collect().map(_.getString(0)).toSeq
    assert(merged == Seq(s"h éé ${Bpe.EndOfWord}", s"中中 文 ${Bpe.EndOfWord}"), merged)
  }

  test("BPE encode: repeated pairs merge leftmost non-overlapping, in rank order") {
    import graft.ml.Bpe
    // "aaaaa": (a,a) -> "aa aa a", then (aa,aa) -> "aaaa a"
    val out = Bpe.encode(Seq("aaaaa").toDF("word"), "word",
      Seq(("a", "a"), ("aa", "aa")))
      .select("sym").collect()(0).getString(0)
    assert(out == s"aaaa a ${Bpe.EndOfWord}", out)
    // rank order is NOT re-greedy: (a,b) consumes the b, so (b,c) no-ops
    val out2 = Bpe.encode(Seq("abc").toDF("word"), "word",
      Seq(("a", "b"), ("b", "c")))
      .select("sym").collect()(0).getString(0)
    assert(out2 == s"ab c ${Bpe.EndOfWord}", out2)
  }

  test("BPE learn on a repeated-symbol corpus ranks overlapping pairs deterministically") {
    import graft.ml.Bpe
    val docs = Seq("aaaa aaaa", "aaaa").toDF("text")
    val (merges, words) = Bpe.learnMerges(docs, "text", numMerges = 2)
    val m = merges.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // round 2 ties at cnt 3: ("aa aa" vs "aa </w>") — the documented binary
    // collation tiebreak picks "aa </w>" ('<' 0x3C sorts before 'a' 0x61)
    assert(m == Seq((1L, "a", "a"), (2L, "aa", Bpe.EndOfWord)), m)
    val sym = words.select("sym").collect().map(_.getString(0)).toSeq
    assert(sym == Seq(s"aa aa${Bpe.EndOfWord}"), sym)
  }

  test("crossDocSpans finds maximal diagonal runs and respects the hot-hash cap") {
    // docs 1/2 share hashes h10..h12 consecutively on diagonal 0 (one run of
    // 3) and h20 at misaligned positions (its own 1-run); h99 is shared by
    // 3 docs with cap 2 -> contributes nothing
    val chunks = Seq(
      (1L, 0, 10L), (1L, 1, 11L), (1L, 2, 12L), (1L, 5, 20L), (1L, 7, 99L),
      (2L, 0, 10L), (2L, 1, 11L), (2L, 2, 12L), (2L, 6, 20L), (2L, 8, 99L),
      (3L, 0, 99L)).toDF("doc_id", "start_token", "chunk_hash")
    val out = graft.ml.Dedup.crossDocSpans(chunks, "doc_id", windowTokens = 5,
        maxDocsPerHash = 2)
      .orderBy("id_a", "id_b", "start_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, 2L, 0, 0, 3L, 7L),   // run of 3 windows = 3-1+5 = 7 tokens
      (1L, 2L, 5, 6, 1L, 5L)),  // isolated match, its own span
      out.toString)
  }

  test("ngramTerms builds adjacent bigrams, short/empty texts yield empty lists") {
    import graft.ml.Retrieval
    val out = Seq("a b c d", "a", "", "  x  y ").toDF("t")
      .select(Retrieval.ngramTerms(F.col("t"), 2).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("a b", "b c", "c d"), Nil, Nil, List("x y")), out)
    val uni = Seq("a b").toDF("t")
      .select(Retrieval.ngramTerms(F.col("t"), 1).as("g"))
      .collect()(0).getSeq[String](0).toList
    assert(uni == List("a", "b"))
  }

  test("ngramCandidates equals ngramTerms filtered to the first-token set") {
    import graft.ml.Retrieval
    val texts = Seq("a b c d", "b c a b a", "a", "", "  x  y ", "c c c")
    val df = texts.toDF("t")
    val firsts = Seq("a", "c")
    val full = df.select(Retrieval.ngramTerms(F.col("t"), 2).as("g"))
      .collect().map(_.getSeq[String](0).toList.filter(g => firsts.contains(g.split(" ")(0))))
    val cand = df.select(Retrieval.ngramCandidates(F.col("t"), 2, firsts).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(cand.toList == full.toList, s"cand=${cand.toList} full=${full.toList}")
    // trigram mask: null heads must propagate, never fabricate short grams
    val full3 = df.select(Retrieval.ngramTerms(F.col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList.filter(g => firsts.contains(g.split(" ")(0))))
    val cand3 = df.select(Retrieval.ngramCandidates(F.col("t"), 3, firsts).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(cand3.toList == full3.toList, s"cand3=${cand3.toList} full3=${full3.toList}")
  }

  test("rrfFuse sums reciprocal ranks across lists, missing docs contribute nothing") {
    import graft.ml.Retrieval
    val l1 = Seq((0, 10L, 1L), (0, 20L, 2L)).toDF("qid", "doc", "rank")
    val l2 = Seq((0, 20L, 1L), (0, 30L, 2L)).toDF("qid", "doc", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), "qid", "doc", kConst = 60, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    // doc 20: 1/62 + 1/61 wins; doc 10: 1/61; doc 30: 1/62
    assert(out == Seq(
      (20L, 1.0 / 62 + 1.0 / 61, 2L),
      (10L, 1.0 / 61, 1L),
      (30L, 1.0 / 62, 1L)), out.toString)
  }

  test("dedupByClustersKeepBest keeps the highest-quality doc per cluster, ties min id") {
    // cluster {1,2,3} qualities 5,9,9 -> keep 2; singleton 7 kept
    val docs = Seq((1L, 5), (2L, 9), (3L, 9), (7L, 1)).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = graft.ml.Dedup.dedupByClustersKeepBest(docs, "id", pairs, F.col("q"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 7L), kept.toString)
  }

  test("removeCrossDocSpans erases the shared run from the higher-id copy only") {
    // docs share the 6-token run "one two three four five six"; windowTokens
    // 3 at stride 1 -> spans cover it fully in doc 2; doc 1 keeps everything
    val docs = Seq(
      (1L, "one two three four five six alpha beta"),
      (2L, "gamma one two three four five six delta")).toDF("doc_id", "text")
    val out = graft.ml.Dedup.removeCrossDocSpans(docs, "text", "doc_id",
        windowTokens = 3, minMatchTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out(0) == (1L, "one two three four five six alpha beta", 8L, 0L), out(0).toString)
    assert(out(1) == (2L, "gamma delta", 8L, 6L), out(1).toString)
  }

  test("calendar rolling frame aggregates an ewm chain per window") {
    // dates 01-05, 01-20, 02-10; 1mo trailing windows: [1], [1,3], [3,5];
    // ewm(alpha=.5, adjust=true).last per window: 1, (0.5+3)/1.5, (1.5+5)/1.5
    val df = LazyFrame(Seq(
      ("2024-01-05", 1.0), ("2024-01-20", 3.0), ("2024-02-10", 5.0))
      .toDF("d", "v")
      .select(F.to_date(F.col("d")).as("d"), F.col("v")))
    val out = df.rolling("d", "1mo")
      .agg("e" -> col("v").ewmMean(alpha = Some(0.5)).last)
      .toSpark.orderBy("d").select("e").collect().map(_.getDouble(0)).toSeq
    assert(out.size == 3, out.toString)
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1) - 3.5 / 1.5) < 1e-12)
    assert(math.abs(out(2) - 6.5 / 1.5) < 1e-12)
  }

  test("hashSplit: deterministic, exhaustive, md5-boundary semantics, shuffle-free") {
    val df = spark.range(0, 2000).toDF("id")
    val out = graft.ml.Sampling.hashSplit(df, "id")
    // assignment matches the documented md5-prefix rule row by row
    val check = out.withColumn("b",
        F.substring(F.md5(F.concat_ws(":", F.lit("graft"), F.col("id").cast("string"))), 1, 2))
      .withColumn("expect",
        F.when(F.col("b") < "cd", "train").when(F.col("b") < "e6", "val").otherwise("test"))
    assert(check.filter(F.col("split") =!= F.col("expect")).count() == 0)
    // every row assigned, shares near the quantized 205/25/26 of 256
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700, counts.toString)
    // stable under repartitioning (pure function of the id)
    val re = graft.ml.Sampling.hashSplit(df.repartition(7), "id")
    assert(out.join(re.withColumnRenamed("split", "s2"), "id")
      .filter(F.col("split") =!= F.col("s2")).count() == 0)
    // no exchange in the plan: the split is narrow
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // custom weights/names + quantization guard
    val two = graft.ml.Sampling.hashSplit(df, "id", Seq(0.5, 0.5), Seq("a", "b"))
    assert(two.select("split").distinct().count() == 2)
    intercept[IllegalArgumentException] {
      graft.ml.Sampling.hashSplit(df, "id", Seq(1.0, 0.0001), Seq("a", "b"))
    }
  }

  test("phraseSearch walks positional postings: adjacency, duplicates, repeats") {
    val docs = Seq(
      (1L, "to be or not to be"),    // "to be" at 0 and 4
      (2L, "be to"),                 // reversed — no match
      (3L, "to to be"),              // match at 1 only
      (4L, "be be be")).toDF("doc_id", "text")
    val idx = graft.ml.Retrieval.invertedIndex(docs, "text", "doc_id")
    val hits = graft.ml.Retrieval.phraseSearch(idx, "doc_id", "to be")
      .orderBy("doc_id", "start").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toList
    assert(hits == List((1L, 0), (1L, 4), (3L, 1)), hits.toString)
    // duplicate-term phrase: "be be" must need BOTH offsets, not one term twice
    val dup = graft.ml.Retrieval.phraseSearch(idx, "doc_id", "be be")
      .orderBy("doc_id", "start").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toList
    assert(dup == List((4L, 0), (4L, 1)), dup.toString)
    // trigram spanning the repeat
    val tri = graft.ml.Retrieval.phraseSearch(idx, "doc_id", "not to be")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(tri == List((1L, 3)), tri.toString)
  }

  test("curateCorpus: each stage drops what it should, audit records the lineage") {
    val good = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val docs = Seq(
      (1L, good),                                     // kept end to end
      (2L, good),                                     // exact dup of 1 -> exact_dedup
      (3L, good.replace("quick", "rapid")),           // near dup of 1 -> near_dedup
      (4L, "too short"),                              // -> quality (min words)
      (5L, good.replace("fox", "cat").replace("dog", "bird")
        .replace("quick", "slow").replace("lazy", "busy")
        .replace("brown", "grey").replace("jumps", "hops")
        .replace("runs", "walks").replace("far", "near")
        .replace("home", "out").replace("tonight", "today")), // distinct enough: kept
      (6L, "a completely different benchmark sentence about training data leaks" +
        " that would be contaminated if present in evaluation sets somewhere"))
      .toDF("doc_id", "text")
    val bench = Seq((100L,
      "a completely different benchmark sentence about training data leaks" +
        " that would be contaminated if present in evaluation sets somewhere"))
      .toDF("doc_id", "text")
    val res = graft.ml.Pipeline.curateCorpus(docs, "text", "doc_id",
      benchmark = Some(bench), minWords = 10, nearDupThreshold = 0.5)
    val audit = res.audit.map(s => (s.stage, s.rowsIn, s.rowsOut))
    assert(audit == Seq(
      ("quality", 6L, 5L),        // drops 4
      ("exact_dedup", 5L, 4L),    // drops 2
      ("near_dedup", 4L, 3L),     // drops 3
      ("decontaminate", 3L, 2L)), // drops 6
      audit.toString)
    val kept = res.kept.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toList
    assert(kept == List(1L, 5L), kept.toString)
  }

  test("triangleCount: orientation, symmetrization, duplicates, self-loops") {
    // K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles; edges arrive in
    // mixed directions, with duplicates and a self-loop to be dropped
    val k4 = Seq((1L,2L),(2L,1L),(3L,1L),(1L,4L),(2L,3L),(4L,2L),(3L,4L),(4L,4L),(1L,2L))
      .toDF("src","dst")
    val got = graft.ml.Graph.triangleCount(k4, "src", "dst")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L,3L),(2L,3L),(3L,3L),(4L,3L)), got.toString)
    // a star has degree but ZERO closure: no output rows (count > 0 only)
    val star = Seq((0L,1L),(0L,2L),(0L,3L),(0L,4L)).toDF("src","dst")
    assert(graft.ml.Graph.triangleCount(star, "src", "dst").count() == 0)
  }

  test("cooccurrencePmi matches a local reference on a hand corpus") {
    val docs = Seq("a b c a", "b a").toDF("text")
    // window 2, doc1 pairs: (a,b),(a,c),(b,c),(a,b),(a,c),(a,a)? positions:
    // [a,b,c,a]: i=0:(a,b),(a,c); i=1:(b,c),(a,b); i=2:(a,c); doc2 [b,a]: (a,b)
    // P=6, T=6; c(a)=3, c(b)=2, c(c)=1
    val got = graft.ml.TextAnalysis.cooccurrencePmi(docs, "text", window = 2)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toList
    def pmi(np: Long, ca: Long, cb: Long) =
      math.log((np / 6.0) / ((ca / 6.0) * (cb / 6.0)))
    val want = List(
      ("a", "b", 3L, pmi(3, 3, 2)),
      ("a", "c", 2L, pmi(2, 3, 1)),
      ("b", "c", 1L, pmi(1, 2, 1)))
    assert(got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)), got.toString)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._4 - w._4) < 1e-12) }
  }

  test("randomized differential: invertedIndex + phraseSearch vs a local reference") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 40L).map(i => (i,
      (0 until (1 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val idx = graft.ml.Retrieval.invertedIndex(df, "text", "doc_id")
    val refPostings = docs.flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).zipWithIndex.map { case (w, p) => ((w, id), p) }
    }.groupBy(_._1).map { case ((w, id), xs) =>
      (w, id, xs.size.toLong, xs.map(_._2).sorted.toList)
    }.toSet
    val got = idx.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Int](3).toList)).toSet
    assert(got == refPostings)
    for (_ <- 1 to 8) {
      val n = 1 + rnd.nextInt(3)
      val ph = (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val hits = graft.ml.Retrieval.phraseSearch(idx, "doc_id", ph)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val refHits = docs.flatMap { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        val p = ph.split(" ")
        (0 to toks.length - p.length)
          .filter(s => p.indices.forall(k => toks(s + k) == p(k))).map(s => (id, s))
      }.toSet
      assert(hits == refHits, s"phrase '$ph'")
    }
  }

  test("phraseSnippets: windows clamp at both document edges") {
    val docs = Seq((1L, "to be or not to be that is the question")).toDF("doc_id", "text")
    val out = graft.ml.Retrieval.phraseSnippets(docs, "text", "doc_id", "to be", context = 3)
      .orderBy("start").collect()
      .map(r => (r.getInt(1), r.getString(2))).toList
    assert(out == List(
      (0, "to be or not to"),                 // clamped at the left edge
      (4, "be or not to be that is the")), out.toString)
  }

  test("new-operator edges: null text, absent phrase terms, negative split ids") {
    // null/whitespace text contributes no postings (and no crash)
    val docs = Seq((1L, null: String), (2L, " \t "), (3L, "x y")).toDF("doc_id", "text")
    val idx = graft.ml.Retrieval.invertedIndex(docs, "text", "doc_id")
    assert(idx.count() == 2)
    // phrase with a term absent from the index: empty, not an error
    assert(graft.ml.Retrieval.phraseSearch(idx, "doc_id", "x z").count() == 0)
    // multi-byte text: positions index the token sequence, not bytes
    val uni = Seq((1L, "héllo wörld héllo")).toDF("doc_id", "text")
    val hit = graft.ml.Retrieval.phraseSearch(
      graft.ml.Retrieval.invertedIndex(uni, "text", "doc_id"), "doc_id", "wörld héllo")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(hit == List((1L, 1)), hit.toString)
    // hashSplit: negative ids assign deterministically too
    val neg = graft.ml.Sampling.hashSplit(
      spark.range(-100, 0).toDF("id"), "id")
    assert(neg.count() == 100)
    assert(neg.select("split").distinct().count() >= 2)
  }

  test("invertedIndex: postings carry tf and sorted 0-based positions") {
    val docs = Seq(
      (1L, "b a b  c b"), (2L, "a a"), (3L, "   "), (4L, "c")).toDF("doc_id", "text")
    val rows = graft.ml.Retrieval.invertedIndex(docs, "text", "doc_id")
      .orderBy("term", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Int](3).toList))
    assert(rows.toList == List(
      ("a", 1L, 1L, List(1)), ("a", 2L, 2L, List(0, 1)),
      ("b", 1L, 3L, List(0, 2, 4)),
      ("c", 1L, 1L, List(3)), ("c", 4L, 1L, List(0))), rows.mkString(";"))
  }
}

package graft

import graft.ml.{Contamination, Packing, QualityFilters, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{functions => F}

/** Round-4 training-corpus curation operators: repetition filters,
  * decontamination, sampling, packing, TF-IDF, embedding quantization. */
class Ml2Spec extends SparkSpec {
  import spark.implicits._

  test("duplicate word fraction and n-gram builders") {
    val df = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "")).toDF("id", "t")
    val out = df.select(F.col("id"),
        QualityFilters.duplicateWordFraction(F.col("t")).as("dwf"),
        QualityFilters.wordNgrams(F.col("t"), 2).as("g2"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 1.0 - 2.0 / 5.0)
    assert(out(1).getDouble(1) == 0.0)
    assert(out(2).getDouble(1) == 0.0)
    assert(out(0).getSeq[String](2) == Seq("a b", "b a", "a b", "b a"))
    assert(out(2).getSeq[String](2) == Seq.empty)
  }

  test("repetition signals: top/dup 2-gram char coverage") {
    // "a b a b c": 2-grams = [a b, b a, a b, b c]; top = "a b" x2 (3 chars)
    // dup chars = 2*3 = 6; total chars = 9
    val df = Seq((1L, "a b a b c")).toDF("id", "t")
    val out = QualityFilters.repetitionSignals(df, "t", "id", n = 2).collect()(0)
    assert(out.getAs[Double]("top_ngram_char_fraction") == 6.0 / 9.0)
    assert(out.getAs[Double]("dup_ngram_char_fraction") == 6.0 / 9.0)
  }

  test("gopher keep predicate enforces word-count and repetition caps") {
    val ok = ("word " * 60).trim
    val tooShort = "too short"
    val repetitive = ("spam " * 60).trim // dup word fraction ~ 59/60 > 0.63
    val df = Seq((1L, ok), (2L, tooShort), (3L, repetitive)).toDF("id", "t")
    val kept = df.filter(QualityFilters.gopherKeep(F.col("t"), maxDupWordFraction = 0.63))
      .collect().map(_.getLong(0)).toSet
    // "ok" is also repetitive (single word repeated) — use distinct words
    val varied = (1 to 60).map(i => s"word$i").mkString(" ")
    val kept2 = Seq((4L, varied)).toDF("id", "t")
      .filter(QualityFilters.gopherKeep(F.col("t"))).count()
    assert(!kept.contains(2L) && !kept.contains(3L))
    assert(kept2 == 1L)
  }

  test("contamination overlap counts shared distinct n-grams") {
    val train = Seq((1L, "alpha beta gamma delta"), (2L, "nothing shared here at all"))
      .toDF("id", "t")
    val bench = Seq((100L, "alpha beta gamma zeta")).toDF("id", "t")
    val out = Contamination.ngramOverlap(train, bench, "t", "id", n = 3)
      .orderBy("id").collect()
    // doc 1 grams: [alpha beta gamma, beta gamma delta]; bench shares the first
    assert(out(0).getAs[Long]("n_grams") == 2L)
    assert(out(0).getAs[Long]("n_overlap") == 1L)
    assert(out(0).getAs[Long]("n_bench_docs") == 1L)
    assert(out(0).getAs[Double]("overlap_ratio") == 0.5)
    assert(out(1).getAs[Long]("n_overlap") == 0L)
    val clean = Contamination.decontaminate(train, bench, "t", "id", n = 3,
      maxOverlapRatio = 0.5).collect().map(_.getLong(0))
    assert(clean.toSeq == Seq(2L))
  }

  test("stratified exact sample takes ceil(frac * n) per stratum in order") {
    val df = (1L to 10L).map(i => (i, if (i <= 7) "en" else "de")).toDF("id", "lang")
    val out = Sampling.stratifiedExact(df, "lang", 0.3, "id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // en: ceil(7*0.3)=3 -> 1,2,3 ; de: ceil(3*0.3)=1 -> 8
    assert(out == Seq(1L, 2L, 3L, 8L))
  }

  test("hash sample is deterministic and approximately sized") {
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.25, seed = 7).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "id", 0.25, seed = 7).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size - 500) < 100)
    val c = Sampling.hashSample(df, "id", 0.25, seed = 8).collect().map(_.getLong(0)).toSet
    assert(a != c)
  }

  test("capPerStratum keeps first-n per stratum, others whole") {
    val df = (1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "s")
    val out = Sampling.capPerStratum(df, "s", Map("even" -> 2L), "id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L)) // evens capped at {2,4}
  }

  test("linear packing assigns bins by preceding token offset") {
    val df = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 500L)).toDF("id", "ntok")
    val out = Packing.linearPack(df, "ntok", "id", budget = 512L)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("bin_offset"))).toSeq
    // offsets: 0, 300, 600, 700 -> bins 0,0,1,1 ; offsets%512: 0,300,88,188
    assert(out == Seq((0L, 0L), (0L, 300L), (1L, 88L), (1L, 188L)))
  }

  test("next-fit packing never splits a doc and never overfills a bin") {
    val df = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 500L), (5L, 600L))
      .toDF("id", "ntok")
    val out = Packing.nextFitPack(df, "ntok", "id", budget = 512L)
      .orderBy("id").collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin"))
    // greedy: 300 -> bin0; 300 overflows -> bin1; +100=400 fits bin1;
    // 500 overflows -> bin2; 600 oversized -> bin3 alone
    assert(out.toSeq == Seq(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    val stats = Packing.binStats(
      Packing.nextFitPack(df, "ntok", "id", 512L), "ntok", 512L)
      .orderBy("bin").collect()
    assert(stats.map(_.getAs[Long]("n_tokens")).toSeq == Seq(300L, 400L, 500L, 600L))
  }

  test("next-fit packing bins are globally unique across partitions") {
    val df = (1L to 400L).map(i => (i, 100L)).toDF("id", "ntok").repartition(8)
    val packed = Packing.nextFitPack(df, "ntok", "id", budget = 500L)
    // 5 docs per bin within each sorted range; bins distinct count = total/5
    val bins = packed.select("bin").distinct().count()
    val perBin = Packing.binStats(packed, "ntok", 500L)
      .agg(F.max("n_tokens")).collect()(0).getLong(0)
    assert(perBin <= 500L)
    assert(bins >= 80L) // 400 docs / 5-per-bin = 80 bins minimum
  }

  test("tfidf surfaces rare terms; top term deterministic") {
    val df = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common other other")).toDF("id", "t")
    val top = TextAnalysis.topTfidfTerm(df, "t", "id").orderBy("id").collect()
    assert(top(0).getAs[String]("top_term") == "rare") // df=1 vs common df=3
    assert(top(0).getAs[Double]("top_tfidf") == (1.0 / 3.0) * (3.0 / 1.0))
    assert(top(2).getAs[String]("top_term") == "other")
  }

  test("null and empty texts flow through curation ops without crashing") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    // repetition signals: null/empty docs come back with zero/null fractions
    val rep = QualityFilters.repetitionSignals(docs, "text", "doc_id", 2)
      .orderBy("doc_id").collect()
    assert(rep.length == 3)
    assert(rep(2).getAs[Double]("top_ngram_char_fraction") == 0.0)
    // n-gram explode drops null/empty docs, keeps real ones
    assert(Contamination.docNgrams(docs, "text", "doc_id", 3).count() == 3)
    // contamination report covers only docs that produced grams
    val bench = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val rep2 = Contamination.ngramOverlap(docs, bench, "text", "doc_id", 3)
      .collect()
    assert(rep2.map(_.getLong(0)).toSeq == Seq(1L))
    // tfidf ignores null/empty docs
    assert(TextAnalysis.topTfidfTerm(docs, "text", "doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // corpus report keeps the rows (null text -> null sums propagate as null)
    assert(TextAnalysis.corpusReport(docs.withColumn("lang", F.lit("en")),
      "text", "lang").count() == 1)
    // exact dedup treats null and empty as distinct values, no crash
    assert(graft.ml.Dedup.exact(docs, "text", idCol = "doc_id").count() == 3)
    // packing: null token counts would poison the cumsum — callers coalesce;
    // tokenCount(null) is null, so pin that contract here
    val ntok = docs.select(TextAnalysis.tokenCount(F.col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(ntok == Seq(5, -1, 0))
  }

  test("one-call near-dedup drops verified near-dups, keeps sub-threshold pairs") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running through the long empty field tonight"
    val near = base.replace("tonight", "today") // high jaccard
    val mid = "the quick brown fox sleeps under a tree while everything else in the field is completely different now"
    val docs = Seq((1L, base), (2L, near), (3L, mid), (4L, "entirely unrelated text about query engines"))
      .toDF("doc_id", "text")
    val kept = graft.ml.Dedup.nearDedupMinhash(docs, "text", "doc_id", threshold = 0.7)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L)) // 2 clusters with 1; 3 is similar-ish but < 0.7
  }

  test("gopherFilter keeps varied prose, drops short and repetitive docs") {
    val varied = (1 to 60).map(i => s"word$i").mkString(" ")
    val repetitiveNgrams = ("alpha beta " * 40).trim // dup 2-gram coverage ~ 1
    val docs = Seq((1L, varied), (2L, "too short"), (3L, repetitiveNgrams))
      .toDF("doc_id", "text")
    val kept = graft.ml.QualityFilters.gopherFilter(docs, "text", "doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
    val explained = graft.ml.QualityFilters.gopherFilter(docs, "text", "doc_id",
      explain = true)
    assert(explained.columns.contains("top_ngram_char_fraction"))
  }

  test("corpusReport aggregates per stratum") {
    val docs = Seq((1L, "a b c", "en"), (2L, "d e", "en"), (3L, "x", "de"))
      .toDF("doc_id", "text", "lang")
    val rep = graft.ml.TextAnalysis.corpusReport(docs, "text", "lang")
      .orderBy("lang").collect()
    assert(rep(0).getAs[Long]("n_docs") == 1L && rep(0).getAs[Long]("n_tokens") == 1L)
    assert(rep(1).getAs[Long]("n_docs") == 2L && rep(1).getAs[Long]("n_tokens") == 5L)
    assert(rep(1).getAs[Double]("avg_tokens") == 2.5)
    assert(rep(1).getAs[Int]("min_chars") == 3 && rep(1).getAs[Int]("max_chars") == 5)
  }

  test("bloom candidate pre-filter is a superset of exact overlap, subset on clean docs") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "totally clean document nothing shared"),
      (3L, "epsilon zeta eta theta iota")).toDF("id", "t")
    val bench = Seq((100L, "alpha beta gamma zeta"),
      (101L, "epsilon zeta eta qqq")).toDF("id", "t")
    val cand = Contamination.bloomCandidates(train, bench, "t", "id", n = 3)
      .collect().map(_.getLong(0)).toSet
    // docs 1 and 3 share a 3-gram with the benchmark; doc 2 shares none —
    // with fpp=0.01 and this tiny filter a false positive is ~impossible
    assert(cand.contains(1L) && cand.contains(3L))
    assert(!cand.contains(2L))
  }

  test("count-min term sketch over-estimates, bounded by eps * total") {
    val docs = Seq(
      (1L, "spark spark spark duck"),
      (2L, "spark row column duck duck")).toDF("id", "t")
    val sk = TextAnalysis.termSketch(docs, "t", eps = 0.01)
    val sparkEst = TextAnalysis.estimateTermCount(sk, "spark")
    val duckEst = TextAnalysis.estimateTermCount(sk, "duck")
    assert(sparkEst >= 4L && sparkEst <= 5L) // 9 tokens total, eps slack ~0
    assert(duckEst >= 3L && duckEst <= 4L)
    assert(TextAnalysis.estimateTermCount(sk, "absent") <= 1L)
    val top = TextAnalysis.topTerms(docs, "t", k = 2).collect()
    assert(top(0).getString(0) == "spark" && top(0).getLong(1) == 4L)
    assert(top(1).getString(0) == "duck" && top(1).getLong(1) == 3L)
  }

  test("l2Normalize yields unit vectors; zero vector stays zero") {
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f))).toDF("id", "v")
    val out = df.select(F.col("id"), Similarity.l2Normalize(F.col("v")).as("n"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(out(1).getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("int8 quantization: codes bounded, cosine close to exact") {
    val vecs = Seq(
      (1L, Seq(0.1f, -0.5f, 0.9f, 0.3f)),
      (2L, Seq(0.2f, -0.4f, 0.8f, 0.1f)),
      (3L, Seq(-0.9f, 0.1f, -0.2f, 0.7f))).toDF("id", "v")
    val q = vecs.select(F.col("id"), Similarity.quantizeInt8(F.col("v")).as("q"),
      F.col("v"))
    val codes = q.select(F.col("q.codes")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(_.forall(c => c >= -127 && c <= 127)))
    assert(codes.forall(_.exists(c => math.abs(c) == 127))) // scale hits max
    // quantized cosine within 1% of exact for these magnitudes
    val pairs = q.as("a").crossJoin(q.select(F.col("id").as("id2"),
        F.col("q").as("q2"), F.col("v").as("v2")).as("b"))
      .filter(F.col("id") < F.col("id2"))
      .select(Similarity.cosineQuantized(F.col("q"), F.col("q2")).as("cq"),
        Similarity.cosine(F.col("v"), F.col("v2")).as("c"))
      .collect()
    pairs.foreach { r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.01) }
  }

  test("sessionize: exact-gap events merge, strict exceed splits, ties share a session") {
    val h = 3600L * 1000000
    val rows = Seq( // (user, ts_us)
      (1L, 0L), (1L, 2 * h), (1L, 4 * h + 1),         // merge at exactly 2h, split at 2h+1µs
      (1L, 4 * h + 1), (1L, 4 * h + 1),               // tied timestamps: same session
      (2L, 10 * h))                                   // other key: own numbering from 0
    val df = rows.toDF("user_id", "us")
      .select(F.col("user_id"), F.col("us"), F.timestamp_micros(F.col("us")).as("ts"))
    val got = graft.ml.Sessionize.assign(df, "ts", Seq("user_id"), gapMicros = 2 * h)
      .select("user_id", "us", "session").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq(
      (1L, 0L, 0L), (1L, 2 * h, 0L),
      (1L, 4 * h + 1, 1L), (1L, 4 * h + 1, 1L), (1L, 4 * h + 1, 1L),
      (2L, 10 * h, 0L)))
    val st = graft.ml.Sessionize.stats(
        graft.ml.Sessionize.assign(df, "ts", Seq("user_id"), gapMicros = 2 * h),
        "ts", Seq("user_id")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(4), r.getLong(5)))).toMap
    assert(st((1L, 0L)) == (2L, 2 * h))   // 2 events spanning 2h
    assert(st((1L, 1L)) == (3L, 0L))      // 3 tied events, zero duration
    assert(st((2L, 0L)) == (1L, 0L))
  }

  test("encoding signals flag mojibake, control bytes, and non-ASCII density") {
    val rows = Seq(
      ("clean ascii text", 0.0, 0.0, 0.0),
      ("bad � decode � here", 2.0 / 19, 0.0, 2.0 / 19),
      ("ctl", 0.0, 2.0 / 5, 0.0),
      ("café", 0.0, 0.0, 1.0 / 4),
      ("", 0.0, 0.0, 0.0))
    val df = rows.map(_._1).toDF("t")
      .select(F.col("t"), graft.ml.TextAnalysis.encodingSignals(F.col("t")).as("s"))
      .collect().map(r => (r.getString(0), r.getStruct(1))).toMap
    rows.foreach { case (t, rep, ctl, na) =>
      val s = df(t)
      assert(math.abs(s.getDouble(0) - rep) < 1e-12, s"rep '$t'")
      assert(math.abs(s.getDouble(1) - ctl) < 1e-12, s"ctl '$t'")
      assert(math.abs(s.getDouble(2) - na) < 1e-12, s"na '$t'")
    }
  }

  test("incrementalNearDedup: registry hit across sweeps, min-id owner within a sweep") {
    val reg = java.nio.file.Files.createTempDirectory("graft-increg").toFile
    reg.deleteOnExit()
    val regPath = reg.getAbsolutePath + "/registry"
    val textA = (1 to 60).map(i => s"albatross${i}quiver").mkString(" ")
    val textC = (1 to 60).map(i => s"gargoyle${i}plinth").mkString(" ")
    val textB = "changed " + textA.split(" ", 2)(1)
    val textD = (1 to 60).map(i => s"dromedary${i}sprocket").mkString(" ")
    val sweep1 = graft.ml.Dedup.incrementalNearDedup(
      Seq((1L, textA), (2L, textC)).toDF("doc_id", "text"), "text", "doc_id",
      regPath, sweepId = "s1")
    assert(sweep1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // RERUN of the same sweep id: idempotent — its own registration is
    // excluded by name, so nothing is spuriously dropped
    val rerun1 = graft.ml.Dedup.incrementalNearDedup(
      Seq((1L, textA), (2L, textC)).toDF("doc_id", "text"), "text", "doc_id",
      regPath, sweepId = "s1")
    assert(rerun1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // B near-dups sweep-1's A (registry hit); 5 near-dups 4 in-sweep (owner 4 wins)
    val sweep2 = graft.ml.Dedup.incrementalNearDedup(
      Seq((3L, textB), (4L, textD), (5L, "prefixed " + textD.split(" ", 2)(1)))
        .toDF("doc_id", "text"), "text", "doc_id", regPath, sweepId = "s2")
    assert(sweep2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    intercept[IllegalArgumentException] {
      graft.ml.Dedup.incrementalNearDedup(
        Seq((6L, textA)).toDF("doc_id", "text"), "text", "doc_id", regPath, "a/b")
    }
  }

  test("temperatureSample: null stratum is a real group, not silently dropped") {
    val df = ((1 to 6).map(i => (i.toLong, Option("x"))) ++
      Seq((7L, None: Option[String]), (8L, None: Option[String]))).toDF("id", "s")
    // targetRows large enough that every stratum caps at its own size:
    // all 8 rows survive — including the null stratum's two
    val out = Sampling.temperatureSample(df, "s", "id", targetRows = 20)
    assert(out.count() == 8)
    assert(out.filter(F.col("s").isNull).count() == 2)
    // under a budget the null stratum still gets its sqrt-weighted share
    val tight = Sampling.temperatureSample(df, "s", "id", targetRows = 8)
    assert(tight.filter(F.col("s").isNull).count() == 2) // round(8*√2/(√6+√2)) = 3 → cap 2
    assert(tight.count() == 7) // 5 of x + 2 of null (targets round, not sum)
  }

  test("temperatureSample: sqrt-weighted targets, deterministic rank selection") {
    // strata: x has 8 rows, y has 2; alpha=0.5 -> wt 2sqrt2 : sqrt2,
    // targets for 5 rows: round(5*2/3)=3 and round(5*1/3)=2
    val df = ((1 to 8).map(i => (i.toLong, "x")) ++ Seq((9L, "y"), (10L, "y")))
      .toDF("id", "s")
    val out = Sampling.temperatureSample(df, "s", "id", targetRows = 5)
    val byStratum = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum == Map("x" -> 3L, "y" -> 2L))
    // deterministic: identical selection on rerun
    val again = Sampling.temperatureSample(df, "s", "id", targetRows = 5)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // a stratum is never upsampled past its size
    val tiny = Sampling.temperatureSample(df, "s", "id", targetRows = 100)
    assert(tiny.count() == 10)
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(df, "s", "id", targetRows = 5, alpha = 0.0)
    }
  }

  test("bigramLogProb: add-1 smoothed corpus bigram model, hand-computed") {
    // corpus: a:3 b:2 c:1 (V=3); bigrams: "a b":2, "b a":1
    val df = Seq((1L, "a b a"), (2L, "A b"), (3L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "text", "doc_id")
      .select("doc_id", "lm_score").orderBy("doc_id").collect()
    val pAB = math.log(3.0 / 6.0) // (2+1)/(3+3)
    val pBA = math.log(2.0 / 5.0) // (1+1)/(2+3)
    assert(math.abs(out(0).getDouble(1) - (pAB + pBA) / 2) < 1e-12)
    assert(math.abs(out(1).getDouble(1) - pAB) < 1e-12) // case-folded
    assert(out(2).isNullAt(1)) // single token: no bigram
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramLogProb(df, "text", "doc_id", k = 0.0)
    }
  }

  test("chunkDocuments: boundaries, overlap, short/empty docs") {
    val ten = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val df = Seq((1L, ten), (2L, "a b"), (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "text", "doc_id",
        chunkTokens = 4, overlapTokens = 1) // stride 3
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: n=10 -> 1 + ceil(6/3) = 3 chunks at starts 0,3,6
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq == Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10")))
    // doc 2: n=2 <= 4 -> single short chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getLong(1), r.getLong(3), r.getString(4))).toSeq ==
      Seq((0L, 2L, "a b")))
    // empty / whitespace-only docs emit nothing
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L))
    // exact-fit doc: n == chunkTokens -> one chunk, not two
    val exact = TextAnalysis.chunkDocuments(
      Seq((9L, "x1 x2 x3 x4")).toDF("doc_id", "text"), "text", "doc_id", 4, 1).collect()
    assert(exact.length == 1 && exact(0).getLong(3) == 4L)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "text", "doc_id", 4, 4)
    }
  }
}

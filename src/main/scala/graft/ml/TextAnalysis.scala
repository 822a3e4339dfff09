package graft.ml

import org.apache.spark.sql.{Column, functions => F}

/** Text-analysis operators for training-data pipelines (beyond-reference).
  * Pure `functions._` compositions — codegen'd, pushdown-friendly.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    F.when(F.length(F.trim(text)) === 0, 0)
      .otherwise(F.size(F.split(F.trim(text), "\\s+")))

  /** BPE-ish token estimate: word pieces + digits + punctuation as separate
    * tokens (a cheap proxy for tokenizer counts at corpus scale). */
  def bpeishTokenCount(text: Column): Column =
    F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), F.lit(0)))

  def charCount(text: Column): Column = F.length(text)

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    F.size(F.regexp_extract_all(text, F.lit("[\\p{Punct}]"), F.lit(0))).cast("double") /
      F.greatest(F.length(text), F.lit(1)).cast("double")

  /** Uppercase ratio over letters. */
  def upperRatio(text: Column): Column =
    F.size(F.regexp_extract_all(text, F.lit("[A-Z]"), F.lit(0))).cast("double") /
      F.greatest(F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]"), F.lit(0))), F.lit(1)).cast("double")

  def meanWordLength(text: Column): Column =
    F.length(F.regexp_replace(text, "\\s+", "")).cast("double") /
      F.greatest(tokenCount(text), F.lit(1)).cast("double")

  private val stopwords = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "je", "pas", "un", "une", "avec"),
    "es" -> Seq("el", "la", "los", "y", "es", "yo", "no", "un", "una", "con"))

  def tokens(text: Column): Column = F.split(F.lower(F.trim(text)), "\\s+")

  /** Canonical text normalization before any fingerprint/dedup: Unicode
    * normal form (native codegen expression [[graft.ext.UnicodeNorm]] — two
    * byte-different encodings of the same visible string must hash
    * identically), optional accent folding (NFD + combining-mark strip,
    * then renormalized), lowercase, whitespace collapse + trim. Pure
    * column composition — codegen end to end, no UDF. */
  def normalizeText(text: Column, form: String = "NFC",
                    lowercase: Boolean = true, stripMarks: Boolean = false,
                    collapseWhitespace: Boolean = true): Column = {
    require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
      s"normalizeText: form must be one of NFC/NFD/NFKC/NFKD, got $form")
    import org.apache.spark.sql.GraftInternalOps
    def norm(c: Column, f: String): Column =
      GraftInternalOps.column(graft.ext.UnicodeNorm(
        GraftInternalOps.expression(c), GraftInternalOps.expression(F.lit(f))))
    var c = if (stripMarks)
      norm(F.regexp_replace(norm(text, "NFD"), "\\p{M}+", ""), form)
    else norm(text, form)
    if (lowercase) c = F.lower(c)
    if (collapseWhitespace) c = F.trim(F.regexp_replace(c, "\\s+", " "))
    c
  }

  /** Stopword ratio against a language's stopword list. Prefer the
    * `FromTokens` variant over a materialized token column in bulk pipelines —
    * the split would otherwise re-evaluate per language per row. */
  def stopwordRatio(text: Column, lang: String = "en"): Column =
    stopwordRatioFromTokens(tokens(text), lang)

  def stopwordRatioFromTokens(toks: Column, lang: String = "en"): Column =
    F.size(F.filter(toks, t => t.isin(stopwords(lang): _*))).cast("double") /
      F.greatest(F.size(toks), F.lit(1)).cast("double")

  /** N-gram-heuristic language ID: argmax of per-language stopword hit ratio;
    * "und" (undetermined) when no list scores above the floor. */
  def languageId(text: Column, floor: Double = 0.05): Column =
    languageIdFromTokens(tokens(text), floor)

  def languageIdFromTokens(toks: Column, floor: Double = 0.05): Column = {
    val scored = stopwords.toSeq.map { case (lang, _) =>
      F.struct(stopwordRatioFromTokens(toks, lang).as("score"), F.lit(lang).as("lang"))
    }
    val best = scored.reduce((a, b) =>
      F.when(a.getField("score") >= b.getField("score"), a).otherwise(b))
    F.when(best.getField("score") >= floor, best.getField("lang")).otherwise(F.lit("und"))
  }

  /** Bulk language-ID: explode tokens → codegen'd conditional sums per
    * language → argmax. One narrow explode + one map-side-combined groupBy —
    * the corpus-scale shape (the Column variants above are interpreted HOFs,
    * fine for ad-hoc expressions only). Output: input columns of `keep` +
    * `pred`. */
  def languageIdBulk(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, keep: Seq[String] = Nil,
                     floor: Double = 0.05): org.apache.spark.sql.DataFrame = {
    val keys = (idCol +: keep).map(F.col)
    // explode_outer: a null/empty text must keep its row (scoring "und"),
    // not vanish from the output — plain explode of a null array emits none
    val tok = df.select((keys :+ F.explode_outer(tokens(F.col(textCol))).as("__tok__")): _*)
    val hits = stopwords.toSeq.map { case (lang, words) =>
      F.sum(F.when(F.col("__tok__").isin(words: _*), 1L).otherwise(0L)).as(s"__hit_$lang")
    }
    val agg = tok.groupBy(keys: _*)
      .agg(F.count(F.lit(1)).as("__n__"), hits: _*)
    val scored = stopwords.keys.toSeq.map { l =>
      F.struct((F.col(s"__hit_$l") / F.greatest(F.col("__n__"), F.lit(1))).as("score"),
        F.lit(l).as("lang"))
    }
    val best = scored.reduce((a, b) =>
      F.when(a.getField("score") >= b.getField("score"), a).otherwise(b))
    agg.withColumn("pred",
        F.when(best.getField("score") >= floor, best.getField("lang")).otherwise(F.lit("und")))
      .select((keys :+ F.col("pred")): _*)
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate punctuation,
    * healthy stopword density, sane word lengths. */
  def qualityScore(text: Column): Column = {
    val lenScore = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    val punctScore = F.lit(1.0) - F.least(punctRatio(text) * 5.0, F.lit(1.0))
    val stopScore = F.least(stopwordRatio(text) * 4.0, F.lit(1.0))
    val wordLen = meanWordLength(text)
    val wordScore = F.when(wordLen.between(3.0, 9.0), 1.0).otherwise(0.5)
    (lenScore + punctScore + stopScore + wordScore) / 4.0
  }

  /** Encoding-health signals for corpus curation: mojibake (U+FFFD
    * replacement chars from a bad decode), stray control bytes, and
    * non-ASCII density — the cheap first-pass filters before any
    * language-specific processing. Pure regexp counts, fully codegen'd;
    * ratios are exact IEEE divisions of two ints so they hash identically
    * across engines. */
  def encodingSignals(text: Column): Column = {
    val len = F.greatest(F.length(text), F.lit(1)).cast("double")
    F.struct(
      (F.regexp_count(text, F.lit("�")) / len).as("replacement_ratio"),
      (F.regexp_count(text, F.lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")) / len).as("control_ratio"),
      (F.regexp_count(text, F.lit("[^\\x00-\\x7F]")) / len).as("non_ascii_ratio"))
  }

  /** Deterministic document fingerprint: xxhash64 of the normalized text. */
  def fingerprint(text: Column): Column =
    F.xxhash64(F.lower(F.regexp_replace(text, "[^a-zA-Z0-9]+", " ")))

  /** Winnowing-style robust fingerprint: min hash over character n-grams
    * (rolling-hash flavored; stable under small edits at the ends). */
  def robustFingerprint(text: Column, k: Int = 8): Column =
    F.array_min(F.transform(Dedup.shingles(text, k), s => F.xxhash64(s)))

  // ---- PII scrubbing (training corpora must not memorize contact data) ----
  // Deliberately simple, auditable patterns — codegen'd regexp_replace, no
  // UDF; swap patterns per policy. Order matters: emails before phones so a
  // user@host with digits isn't half-eaten.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails, phone-like digit runs and IPv4 literals. */
  def redactPii(text: Column,
                emailTag: String = "[EMAIL]", phoneTag: String = "[PHONE]",
                ipTag: String = "[IP]"): Column =
    F.regexp_replace(
      F.regexp_replace(
        F.regexp_replace(text, EmailPattern, emailTag),
        Ipv4Pattern, ipTag),
      PhonePattern, phoneTag)

  /** Count of PII hits per kind (pre-redaction audit metric). Group idx 0 —
    * Spark's regexp_extract_all defaults to group 1, which errors on
    * group-less patterns. */
  def piiCounts(text: Column): Column = F.struct(
    F.size(F.regexp_extract_all(text, F.lit(EmailPattern), F.lit(0))).as("emails"),
    F.size(F.regexp_extract_all(text, F.lit(Ipv4Pattern), F.lit(0))).as("ips"))

  // ---- URL analysis (per-domain quality/dedup grouping) ----
  /** Registrable host of a URL-ish string, lowercased, null when absent —
    * pure regexp, so it stays inside whole-stage codegen (parse_url is
    * UTF8String-library-backed but regexp keeps the DuckDB oracle exact). */
  def urlHost(url: Column): Column = {
    val h = F.regexp_extract(F.lower(url), "^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    F.when(h === "", F.lit(null)).otherwise(h)
  }

  /** Extract all http(s) URLs from free text. */
  def extractUrls(text: Column): Column =
    F.regexp_extract_all(text, F.lit("https?://[^\\s<>\"')\\]]+"), F.lit(0))

  // ---- Corpus-level term weighting (rare-term surfacing, keyword dedup) ----

  /** Per-(doc, term) TF-IDF over the corpus. Linear idf (N/df, no log) so
    * every arithmetic step is an exactly-rounded IEEE division — the score is
    * bit-reproducible across engines, which a transcendental log is not.
    *
    * Shape: explode tokens -> (id, term) hash-agg -> term-keyed df agg joined
    * back (term table is corpus-vocabulary-sized -> broadcast), doc length
    * from the original frame. Two shuffles total; N via a 1-row aggregate
    * cross join (no driver action, stays one job). */
  def tfidf(df: org.apache.spark.sql.DataFrame, textCol: String,
            idCol: String): org.apache.spark.sql.DataFrame = {
    // split("") yields [""] — drop empty terms so empty/whitespace docs
    // don't surface a phantom "" token
    val toks = df.select(F.col(idCol), F.explode(tokens(F.col(textCol))).as("term"))
      .filter(F.col("term") =!= "")
    val tf = toks.groupBy(F.col(idCol), F.col("term"))
      .agg(F.count(F.lit(1)).as("cnt"))
    val docLen = df.select(F.col(idCol),
      F.size(tokens(F.col(textCol))).cast("long").as("__ntok__"))
    val dfreq = tf.groupBy(F.col("term")).agg(F.count(F.lit(1)).as("doc_freq"))
    val n = df.select(F.count(F.lit(1)).as("__n__"))
    tf.join(docLen, Seq(idCol))
      .join(F.broadcast(dfreq), Seq("term"))
      .crossJoin(F.broadcast(n))
      .select(F.col(idCol), F.col("term"), F.col("cnt"), F.col("doc_freq"),
        ((F.col("cnt").cast("double") / F.col("__ntok__").cast("double")) *
          (F.col("__n__").cast("double") / F.col("doc_freq").cast("double")))
          .as("tfidf"))
  }

  /** The top-weighted term per document (ties broken toward the
    * lexicographically-largest term — binary collation, engine-agnostic). */
  def topTfidfTerm(df: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String): org.apache.spark.sql.DataFrame =
    tfidf(df, textCol, idCol)
      .groupBy(F.col(idCol))
      .agg(F.max(F.struct(F.col("tfidf").as("s"), F.col("term").as("t"))).as("__top__"))
      .select(F.col(idCol), F.col("__top__.t").as("top_term"),
        F.col("__top__.s").as("top_tfidf"))

  /** Per-stratum corpus report (the first artifact of any curation run):
    * document/token/char totals and means per language-or-source stratum —
    * one hash aggregation, engine-exact arithmetic. */
  def corpusReport(df: org.apache.spark.sql.DataFrame, textCol: String,
                   strataCol: String): org.apache.spark.sql.DataFrame =
    df.groupBy(F.col(strataCol))
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum(tokenCount(F.col(textCol)).cast("long")).as("n_tokens"),
        F.sum(F.length(F.col(textCol)).cast("long")).as("n_chars"),
        (F.sum(tokenCount(F.col(textCol)).cast("long")).cast("double") /
          F.count(F.lit(1)).cast("double")).as("avg_tokens"),
        F.min(F.length(F.col(textCol))).as("min_chars"),
        F.max(F.length(F.col(textCol))).as("max_chars"))

  /** Exact heavy-hitter terms (top-k by corpus frequency) — hash-agg plus
    * TakeOrderedAndProject; the baseline the sketch variant approximates. */
  def topTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
               k: Int = 100): org.apache.spark.sql.DataFrame =
    df.select(F.explode(tokens(F.col(textCol))).as("term"))
      // an empty/whitespace-only document splits to [""] — an artifact
      // token, not a term
      .filter(F.col("term") =!= "")
      .groupBy("term").agg(F.count(F.lit(1)).as("n"))
      .orderBy(F.col("n").desc, F.col("term"))
      .limit(k)

  /** Mergeable count-min sketch of term frequencies (Spark's builtin
    * count_min_sketch aggregate): one pass, fixed memory regardless of
    * vocabulary size — at 100 TB the per-partition sketches merge in the
    * reduce step instead of shuffling a billion-row (term, count) table.
    * Returns the serialized sketch; query it driver-side via
    * [[estimateTermCount]]. */
  def termSketch(df: org.apache.spark.sql.DataFrame, textCol: String,
                 eps: Double = 0.0001, confidence: Double = 0.99,
                 seed: Int = 42): Array[Byte] =
    df.select(F.explode(tokens(F.col(textCol))).as("term"))
      .agg(F.count_min_sketch(F.col("term"), F.lit(eps), F.lit(confidence),
        F.lit(seed)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)

  /** Point estimate from a [[termSketch]] — always >= the true count, within
    * eps * total-terms with the configured confidence. */
  def estimateTermCount(sketch: Array[Byte], term: String): Long = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch))
    // the SQL aggregate adds strings as their UTF-8 bytes
    cms.estimateCount(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Pointwise mutual information over within-window token co-occurrence —
    * the word2vec/GloVe-shape association statistic used to mine
    * collocations and build embedding-training pair tables. Pairs are
    * UNORDERED (lexicographically canonicalized) from each token's `window`
    * following tokens; pmi(a,b) = ln((c(ab)/P) / ((c(a)/T)·(c(b)/T))) with
    * P total pairs and T total tokens.
    *
    * Scale shape: pair construction is one flatten-of-transforms column
    * (O(len·window) per document, no self-join) over a words array BOUND TO
    * AN ATTRIBUTE FIRST — capturing the tokenization inside the pair lambda
    * would re-run it per element (the documented O(len²) HOF trap). Then
    * one hash aggregation on (w1,w2), one on tokens, two key joins and a
    * 1-row totals broadcast — the TF-IDF budget. */
  def cooccurrencePmi(df: org.apache.spark.sql.DataFrame, textCol: String,
                      window: Int = 2, minCount: Long = 1): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"cooccurrencePmi: window must be >= 1, got $window")
    val words = df.select(
      F.filter(tokens(F.col(textCol)), x => x =!= "").as("__ws__"))
    val pairs = words.select(F.explode(F.flatten(
        F.transform(F.col("__ws__"), (w, i) =>
          F.transform(F.slice(F.col("__ws__"), i + F.lit(2), F.lit(window)),
            w2 => F.struct(F.least(w, w2).as("w1"), F.greatest(w, w2).as("w2")))))).as("p"))
      .select(F.col("p.w1").as("w1"), F.col("p.w2").as("w2"))
    val pairCounts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).as("n_pair"))
    val toks = words.select(F.explode(F.col("__ws__")).as("w"))
    val uni = toks.groupBy("w").agg(F.count(F.lit(1)).as("__cw__"))
    // totals come from the ALREADY-AGGREGATED tiny frames — summing the
    // count tables costs vocabulary-sized work, while counting the raw
    // pair/token streams would re-run the explode scans a second time
    val totals = uni.agg(F.sum(F.col("__cw__")).cast("double").as("__t__"))
      .crossJoin(pairCounts.agg(F.sum(F.col("n_pair")).cast("double").as("__p__")))
    pairCounts
      .join(uni.select(F.col("w").as("w1"), F.col("__cw__").as("__cwa__")), Seq("w1"))
      .join(uni.select(F.col("w").as("w2"), F.col("__cw__").as("__cwb__")), Seq("w2"))
      .crossJoin(F.broadcast(totals))
      .filter(F.col("n_pair") >= minCount)
      .select(F.col("w1"), F.col("w2"), F.col("n_pair"),
        F.log((F.col("n_pair") / F.col("__p__")) /
          ((F.col("__cwa__") / F.col("__t__")) *
            (F.col("__cwb__") / F.col("__t__")))).as("pmi"))
  }

  /** Corpus bigram language-model score — the CCNet/Gopher-shape perplexity
    * proxy WITHOUT an external model: P(wᵢ | wᵢ₋₁) is estimated from the
    * corpus itself with add-k smoothing, and a document's score is the mean
    * log-probability over its bigrams (null for documents with fewer than
    * two tokens). Low scores flag text that is incoherent relative to the
    * corpus distribution — boilerplate, shuffled words, wrong-language
    * fragments — the standard cheap LM-quality signal for training-data
    * curation.
    *
    * score(d) = mean over bigrams (a,b) of ln((c(ab) + k) / (c(a) + k·V)),
    * with c(·) corpus counts and V the unigram vocabulary size.
    *
    * Scale shape: two exploded aggregations build the model tables (shuffle
    * on token / bigram — the TF-IDF shape); V rides along as a broadcast
    * scalar; scoring explodes each document's bigrams once and joins the
    * count tables on their keys (AQE broadcasts them when the vocabulary is
    * small, shuffles otherwise). No driver-side model state. */
  def bigramLogProb(df: org.apache.spark.sql.DataFrame, textCol: String,
                    idCol: String, k: Double = 1.0,
                    scoreCol: String = "lm_score"): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"bigramLogProb: smoothing k must be > 0, got $k (k = 0 " +
      "gives ln(0) = -Inf on any unseen bigram)")
    val toks = tokens(F.col(textCol))
    val uni = df.select(F.explode(toks).as("__w__"))
      .groupBy("__w__").agg(F.count(F.lit(1)).as("__ca__"))
    val vocab = uni.agg(F.count(F.lit(1)).as("__v__"))
    // one tokenize+explode pass feeds BOTH the corpus bigram counts and the
    // per-doc scoring rows (persisted — re-tokenizing 100 TB twice is real)
    val docBigrams = graft.kernel.PrepCache.persistBounded(
      df.select(F.col(idCol), F.explode(
          QualityFilters.wordNgramsFromWords(toks, 2)).as("__bg__"))
        .withColumn("__w__", F.split(F.col("__bg__"), " ", 2).getItem(0)))
    val bi = docBigrams.groupBy("__bg__").agg(F.count(F.lit(1)).as("__cab__"))
    val scored = docBigrams
      .join(bi, Seq("__bg__"))            // every doc bigram is in the corpus counts
      .join(uni, Seq("__w__"))
      .crossJoin(F.broadcast(vocab))
      .groupBy(idCol)
      .agg(F.avg(F.log(
        (F.col("__cab__") + k) / (F.col("__ca__") + F.col("__v__") * k)))
        .as(scoreCol))
    df.join(scored, Seq(idCol), "left")
  }

  /** Overlapping token-window document chunking — the RAG / context-window
    * preprocessing shape: chunk c covers whitespace tokens
    * [c·stride, c·stride + chunkTokens) with stride = chunkTokens −
    * overlapTokens, so consecutive chunks share `overlapTokens` tokens and
    * the last chunk may be short. A document of n tokens yields
    * 1 + ⌈(n − chunkTokens)/stride⌉ chunks (1 when n ≤ chunkTokens); empty
    * documents yield none.
    *
    * One row per (doc, chunk): the token array is materialized once per
    * document and the chunk TEXTS are built inside a single `transform`
    * before the posexplode, so the explode carries finished chunk strings
    * (≈ overlap-factor duplication), never the token array per chunk — the
    * same no-array-in-the-shuffle discipline as [[graft.ml.Dedup.spanChunks]].
    * Pure codegen'd `functions._`; scales as one narrow map, no shuffle.
    *
    * Output: (idCol, chunk_idx, start_token, n_tokens, chunk_text). */
  def chunkDocuments(df: org.apache.spark.sql.DataFrame, textCol: String,
                     idCol: String, chunkTokens: Int = 256,
                     overlapTokens: Int = 32): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"chunkDocuments: need 0 <= overlapTokens < chunkTokens, got " +
        s"chunkTokens=$chunkTokens overlapTokens=$overlapTokens " +
        "(stride would be <= 0 — infinite chunks)")
    val stride = chunkTokens - overlapTokens
    val toks = F.split(F.trim(F.col(textCol)), "\\s+")
    val n = F.size(toks)
    val nChunks = F.when(n <= chunkTokens, F.lit(1))
      .otherwise(F.lit(1) + F.ceil((n - chunkTokens).cast("double") / stride).cast("int"))
    val chunks = F.transform(F.sequence(F.lit(0), nChunks - 1), c =>
      F.struct(
        (c * stride).cast("long").as("start_token"),
        F.least(F.lit(chunkTokens), n - c * stride).cast("long").as("n_tokens"),
        F.array_join(F.slice(toks, c * stride + 1, F.lit(chunkTokens)), " ").as("chunk_text")))
    df.where(F.length(F.trim(F.col(textCol))) > 0)
      .select(F.col(idCol), F.posexplode(chunks).as(Seq("chunk_idx", "__ch__")))
      .select(F.col(idCol), F.col("chunk_idx").cast("long").as("chunk_idx"),
        F.col("__ch__.start_token"), F.col("__ch__.n_tokens"), F.col("__ch__.chunk_text"))
  }
}

package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** One-call batch corpus curation (beyond-reference): the standard
  * pre-training cleaning chain, each stage one of the library's
  * independently-verified operators, plus a per-stage audit of row counts —
  * the lineage record a production curation run must emit. Stages:
  *
  *   1. quality       — Gopher keep predicate ([[QualityFilters.gopherKeep]])
  *   2. exact_dedup   — md5 content hash, keep smallest id ([[Dedup.exact]])
  *   3. near_dedup    — MinHash LSH → exact-Jaccard verify → connected
  *                      components ([[Dedup.nearDedupMinhash]])
  *   4. decontaminate — benchmark n-gram overlap anti-join
  *                      ([[Contamination.decontaminate]]; only when a
  *                      benchmark frame is supplied)
  *
  * Scale shape: each stage is the underlying operator's documented shape;
  * stage outputs run through the shared bounded cache so the audit counts
  * don't recompute the whole chain per action, and the audit itself is a
  * handful of driver-side longs (never row data).
  */
object Pipeline {
  final case class StageCount(stage: String, rowsIn: Long, rowsOut: Long)
  final case class Curated(kept: DataFrame, audit: Seq[StageCount])

  def curateCorpus(docs: DataFrame, textCol: String, idCol: String,
                   benchmark: Option[DataFrame] = None,
                   minWords: Int = 50,
                   nearDupThreshold: Double = 0.7,
                   contaminationN: Int = 3,
                   maxOverlapRatio: Double = 0.5): Curated = {
    val audit = Seq.newBuilder[StageCount]
    // cache the input too: the rows_in count and the first stage's filter
    // would otherwise each scan the raw corpus — the chain's largest frame
    var cur = graft.kernel.PrepCache.persistBounded(docs)
    var n = cur.count()
    def step(name: String, out0: DataFrame): Unit = {
      val out = graft.kernel.PrepCache.persistBounded(out0)
      val m = out.count()
      audit += StageCount(name, n, m)
      cur = out
      n = m
    }
    step("quality",
      cur.filter(QualityFilters.gopherKeep(F.col(textCol), minWords = minWords)))
    step("exact_dedup", Dedup.exact(cur, textCol, keep = "first", idCol = idCol))
    step("near_dedup",
      Dedup.nearDedupMinhash(cur, textCol, idCol, threshold = nearDupThreshold))
    benchmark.foreach { b =>
      step("decontaminate", Contamination.decontaminate(cur, b, textCol, idCol,
        n = contaminationN, maxOverlapRatio = maxOverlapRatio))
    }
    Curated(cur, audit.result())
  }

  /** The audit as a frame: (stage_idx, stage, rows_in, rows_out). */
  def auditFrame(spark: SparkSession, audit: Seq[StageCount]): DataFrame = {
    import spark.implicits._
    audit.zipWithIndex
      .map { case (s, i) => (i + 1, s.stage, s.rowsIn, s.rowsOut) }
      .toDF("stage_idx", "stage", "rows_in", "rows_out")
  }
}

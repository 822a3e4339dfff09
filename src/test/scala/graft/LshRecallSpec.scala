package graft

import org.apache.spark.sql.{functions => F}
import graft.ml.{Dedup, QualityFilters}

/** Pins the RECALL-COMPLETENESS precondition q_curate_audit's oracle relies
  * on (round-10 ADVICE): the oracle takes all-pairs exact Jaccard as
  * near-dedup truth while curateCorpus surfaces candidates through LSH
  * bands, so the gate is sound only while LSH recall is exactly 1.0 on this
  * corpus's injected duplicate margin. That is a data-dependent property —
  * if the testdata regenerates with a thinner margin, THIS spec points at
  * the cause instead of an opaque hash mismatch. */
class LshRecallSpec extends SparkSpec {

  test("LSH recall is complete on the q_curate_audit corpus at its threshold") {
    val dir = "/root/testdata/sf0.001"
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").filter(F.col("doc_id") < 300)
    val copies = docs0.filter(F.col("doc_id") % 10 === 1)
      .select((F.col("doc_id") + 100000).as("doc_id"),
        F.regexp_replace(F.col("text"), "^\\S+", "changed").as("text"))
    val exactCopies = docs0.filter(F.col("doc_id") % 13 === 5)
      .select((F.col("doc_id") + 500000).as("doc_id"), F.col("text"))
    val corpus = docs0.unionAll(copies).unionAll(exactCopies)
    // near-dedup's input inside curateCorpus: after quality + exact stages
    val afterQuality = corpus.filter(
      QualityFilters.gopherKeep(F.col("text"), minWords = 20))
    val afterExact = Dedup.exact(afterQuality, "text", keep = "first", idCol = "doc_id")
    // same LSH configuration nearDedupMinhash(threshold = 0.6) runs with
    val q = Dedup.lshQuality(afterExact, "text", "doc_id",
      threshold = 0.6, numHashes = 64, bands = 16, shingleK = 5).collect()(0)
    val nTrue = q.getAs[Long]("n_true")
    assert(nTrue > 0, "no true near-dup pairs — the gate would be powerless")
    val recall = q.getAs[Double]("recall")
    assert(recall == 1.0,
      s"LSH recall $recall < 1.0 on $nTrue true pairs: the q_curate_audit " +
        "oracle (all-pairs exact Jaccard) no longer matches the LSH-candidate " +
        "pipeline — the corpus margin regressed or the band config changed")
  }
}

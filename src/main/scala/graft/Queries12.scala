package graft

import org.apache.spark.sql.{SparkSession, DataFrame => SDF, functions => F}
import graft.ml.Retrieval

/** Wave-12 driver queries (round 9 tail): sparse retrieval — BM25 scoring
  * of a query set against the document corpus via the inverted-probe shape
  * ([[graft.ml.Retrieval]]). The one transcendental (ln in idf) is rounded
  * to 6 dp before ranking AND in the output, per the exact-hash oracle
  * discipline. */
object Queries12 {

  private def t(s: SparkSession, dir: String, name: String): SDF =
    s.read.parquet(s"$dir/$name.parquet")

  /** BM25 top-10 per query over `documents` for four fixed queries drawn
    * from the corpus vocabulary. Rank key = round(score, 6) desc, doc_id
    * asc — reproducible across engines; output score rounded the same. */
  private def qBm25(s: SparkSession, dir: String): SDF = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val queries = Seq(
      (0, "hash join table"), (1, "window agg spark"),
      (2, "slow filter query"), (3, "merge sort fast"))
      .toDF("query_id", "qtext")
    Retrieval.bm25TopK(docs, "text", "doc_id", queries, "query_id", "qtext",
        k = 10)
      .select(F.col("query_id"), F.col("doc_id"),
        F.round(F.col("score"), 6).as("score"), F.col("matched"),
        F.col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  def queries: Map[String, (SparkSession, String) => SDF] = Map(
    "q_bm25" -> (qBm25 _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_bm25" ->
      """WITH q(query_id, qtext) AS (VALUES
        |    (0, 'hash join table'), (1, 'window agg spark'),
        |    (2, 'slow filter query'), (3, 'merge sort fast')),
        |qt AS (
        |  SELECT DISTINCT query_id,
        |    unnest(regexp_split_to_array(lower(trim(qtext)), '\s+')) AS term
        |  FROM q),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term <> '' AND term IN (SELECT term FROM qt)
        |  GROUP BY ALL),
        |dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
        |dl AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS dl
        |  FROM documents),
        |st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    avg(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS avgdl
        |  FROM documents),
        |s AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    sum(ln(1 + (n - doc_freq + 0.5) / (doc_freq + 0.5))
        |        * (CAST(tf AS DOUBLE) * 2.2)
        |        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS score,
        |    count(*) AS matched
        |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term)
        |  CROSS JOIN st JOIN qt USING (term)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT query_id, doc_id, score, matched,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(score, 6) DESC, doc_id) AS rank
        |  FROM s)
        |SELECT query_id, doc_id, round(score, 6) AS score, matched, rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
  )
}

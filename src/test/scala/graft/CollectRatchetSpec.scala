package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, ReturnAnswer}
import org.apache.spark.sql.catalyst.expressions.{IntegerLiteral, Literal}

/** Whole-query-map COLLECT ratchet (round-13 verdict directive #7): the
  * CartesianProduct ratchet's sibling. Every driver-side materialization an
  * operator performs while BUILDING a query (staged model state, broadcast
  * scalars, kernel bounds) must be bounded — a `collect` whose plan has no
  * limit, no scalar aggregate, and no blessed reason is how unbounded
  * driver memory sneaks back into the tree. Scans the CAPTURED PLANS (via
  * QueryExecutionListener), not the source, so future additions are
  * covered automatically the day they land.
  *
  * Bounded shapes accepted without a blessing:
  *  - root Aggregate with no grouping keys (a 1-row scalar),
  *  - GlobalLimit / CollectLimit / TakeOrderedAndProject with n <= MaxLimit,
  *  - root Aggregate whose grouping is over a blessed small-domain query
  *    (those must be listed in `blessed` with the reason).
  *
  * RDD-level actions (the Quantiles/Ewm/PCA treeReduce kernels) do not pass
  * through the listener — their boundedness is pinned by their own specs.
  * Streaming queries are excluded as in PlanRatchetSpec.
  */
class CollectRatchetSpec extends SparkSpec {

  private val MaxLimit = 200000

  /** Collects whose plan is a grouped aggregate (or key lookup) over a
    * domain bounded by CONSTRUCTION, not by a Limit node — each entry
    * carries the reason the result is small. These are the sites the
    * round-11/12/13 verdict audits verified by hand; the ratchet now keeps
    * them enumerated so a new unbounded collect cannot hide among them. */
  private val blessed: Map[String, String] = Map(
    // k-means family (ml/Clustering.scala:72): per-iteration centroid
    // update collects the (cluster, dimension) cell aggregate — k x dim
    // rows per round, independent of data size
    "q_kmeans" -> "centroid cell aggregate: k x dim rows per iteration",
    "q_kmeans_assign" -> "centroid state: k x dim rows",
    "q_semantic_dedup" -> "centroid state: k x dim rows",
    "q_ivf_topk" -> "coarse centroid state: nlist x dim rows",
    "q_ivf_rerank" -> "coarse centroid state: nlist x dim rows",
    "q_pq_topk" -> "codebook state: m x 256 x dim/m rows",
    // logistic classifier (ml/Classifier.scala:66): per-feature gradient
    // aggregate — #features rows per training epoch
    "q_quality_classifier" -> "per-feature gradient aggregate: #features rows per epoch",
    "q_bpe_merges" -> "merge table: vocab-budget rows per round",
    "q_bpe_encode" -> "merge table: vocab-budget rows (broadcast to the encoder)",
    "q_lsh_quality" -> "band tuning report: bands x rows-per-band summary",
    "q_dedup_cluster" -> "union-find edge sample capped at 64 MB driver budget",
    "q_dedup_pipeline" -> "union-find edge sample capped at 64 MB driver budget",
    "q_dedup_best" -> "union-find edge sample capped at 64 MB driver budget",
    "q_pagerank" -> "per-iteration dangling-mass scalar / rank convergence probe",
    "q_align_frames" -> "distinct key frame of a 3-row literal alignment example",
    // ANN probes (ml/Similarity.scala): the QUERY VECTOR is fetched by its
    // primary key — an equality filter on vec_id, exactly one row
    "q_ann_topk" -> "query-vector lookup by primary key: 1 row",
    // polars eager-split / dummy-encoding surfaces: distinct KEY/category
    // domain (the reference's own API returns one frame per key / one
    // column per category, so the domain is the contract, not an accident)
    "q_partition_by" -> "distinct group keys: the partition_by contract",
    "q_to_dummies" -> "distinct category values: the to_dummies contract",
    // curation audit (ml/Pipeline.scala): one row per pipeline stage
    "q_curate_audit" -> "per-stage audit: #stages rows",
    // phrase BM25 probe prefilter (ml/Retrieval.scala bm25Scores): distinct
    // FIRST tokens of the query n-grams — bounded by the query-term count
    // (tiny by the inverted-probe contract; capped at 64 with a full-stream
    // fallback), collected to mask the corpus n-gram construction
    "q_bm25_bigram" -> "query-phrase first tokens: <= #query-terms rows, capped 64",
    "q_rrf_fusion" -> "query-phrase first tokens: <= #query-terms rows, capped 64",
    // the query RESULT (grouped by c_mktsegment, 5 segment rows) is
    // materialized before the finally-block drops the temp bucketed
    // database out from under the lazy plan (Queries7.scala:358)
    "q_bucketed_join" -> "materialized 5-row segment aggregate (result must outlive the temp db)"
  )

  test("driver-side collects during query build are limit- or scalar-bounded (whole map)") {
    // one shared build pass with PlanRatchetSpec (QueryBuildFixture): the
    // fixture registers the collect listener around the single build and
    // drains the async listener bus after every query, so each captured
    // collect is attributed to the query that RAN it (late delivery under
    // suite-wide load otherwise bleeds a blessed collect onto the next
    // name in order — the r15 full-suite-only flake: q_dedup_cluster's
    // blessed 64MB-capped edge collect landed on q_dedup_exact).
    val offenders = Seq.newBuilder[String]
    QueryBuildFixture.built.foreach {
      case (name, Left(e)) => offenders += s"$name (build failed: ${e.getMessage})"
      case _ => ()
    }
    def bounded(p: LogicalPlan): Boolean = p match {
      case ReturnAnswer(child) => bounded(child)
      case a: Aggregate if a.groupingExpressions.isEmpty => true // 1-row scalar
      case GlobalLimit(IntegerLiteral(n), _) => n <= MaxLimit
      case GlobalLimit(Literal(n: Int, _), _) => n <= MaxLimit
      case _ => false
    }
    val seen = scala.collection.mutable.Set.empty[String]
    for (c <- QueryBuildFixture.collects) {
      // limit bound: the physical plan carries it even under the AQE
      // wrapper — any CollectLimit / TakeOrderedAndProject within MaxLimit
      val limits = "(?:CollectLimit|TakeOrderedAndProject\\(limit=)\\s*(\\d+)".r
        .findAllMatchIn(c.physical).map(_.group(1).toLong).toSeq
      val limitBounded = limits.nonEmpty && limits.forall(_ <= MaxLimit)
      val ok = bounded(c.optimized) || limitBounded || blessed.contains(c.query)
      if (!ok && seen.add(c.query))
        offenders += s"${c.query} [${c.fn}] unbounded driver collect:\n" +
          c.physical.linesIterator.take(4).mkString("\n")
    }
    val bad = offenders.result()
    assert(bad.isEmpty,
      s"unblessed driver-side collects (add a limit/scalar shape, or bless with a reason):\n${bad.mkString("\n")}")
  }
}

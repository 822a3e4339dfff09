package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
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

  private val sfDir = "/root/testdata/sf0.001"
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
    val captured = new ConcurrentLinkedQueue[(String, String, LogicalPlan, String)]()
    var current = ""
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        if (funcName == "collect" || funcName == "collectAsList" || funcName == "toLocalIterator")
          captured.add((current, funcName, qe.optimizedPlan, qe.executedPlan.toString))
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("q_streaming"))
      val offenders = Seq.newBuilder[String]
      // The ExecutionListener rides the shared ASYNC listener bus: under
      // full-suite load a collect executed while building query N can be
      // delivered after `current` has advanced to query N+1, mis-attributing
      // a blessed collect to an unblessed neighbour (the r15 full-suite
      // flake: q_dedup_cluster's blessed 64MB-capped edge collect landed on
      // q_dedup_exact). Drain the bus after every build so attribution is
      // exact. LiveListenerBus.waitUntilEmpty() is private[spark] at the
      // Scala level but public in bytecode — reflection reaches it without
      // a Spark-package shim.
      def drainListenerBus(): Unit = {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .foreach(_.invoke(bus))
      }
      for (name <- names) {
        current = name
        try SparkEntry.queries(name)(spark, sfDir) // build only — the driver collects later
        catch { case e: Throwable => offenders += s"$name (build failed: ${e.getMessage})" }
        drainListenerBus()
      }
      // listener delivery is async on the listener bus: poll until stable
      var last = -1
      var same = 0
      while (same < 5) {
        Thread.sleep(100)
        val n = captured.size
        if (n == last) same += 1 else { same = 0; last = n }
      }
      def bounded(p: LogicalPlan): Boolean = p match {
        case ReturnAnswer(child) => bounded(child)
        case a: Aggregate if a.groupingExpressions.isEmpty => true // 1-row scalar
        case GlobalLimit(IntegerLiteral(n), _) => n <= MaxLimit
        case GlobalLimit(Literal(n: Int, _), _) => n <= MaxLimit
        case _ => false
      }
      import scala.jdk.CollectionConverters._
      val seen = scala.collection.mutable.Set.empty[String]
      for ((qname, fn, plan, physical) <- captured.asScala) {
        // limit bound: the physical plan carries it even under the AQE
        // wrapper — any CollectLimit / TakeOrderedAndProject within MaxLimit
        val limits = "(?:CollectLimit|TakeOrderedAndProject\\(limit=)\\s*(\\d+)".r
          .findAllMatchIn(physical).map(_.group(1).toLong).toSeq
        val limitBounded = limits.nonEmpty && limits.forall(_ <= MaxLimit)
        val ok = bounded(plan) || limitBounded || blessed.contains(qname)
        if (!ok && seen.add(qname))
          offenders += s"$qname [$fn] unbounded driver collect:\n" +
            physical.linesIterator.take(4).mkString("\n")
      }
      val bad = offenders.result()
      assert(bad.isEmpty,
        s"unblessed driver-side collects (add a limit/scalar shape, or bless with a reason):\n${bad.mkString("\n")}")
    } finally spark.listenerManager.unregister(listener)
  }
}

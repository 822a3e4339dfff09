package graft.ml

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.kernel.BoundedRegistry

/** Link-graph operators for corpus quality weighting (beyond-reference).
  *
  * PageRank is the standard authority prior for web-scale training data
  * (host- or page-level rank joined back as a quality feature). Scale
  * shape: each power iteration is ONE shuffle join of the edge list with
  * the current rank vector (both keyed on the source node) plus ONE hash
  * aggregation on the destination — the same budget as a join+groupBy, run
  * k times. The dangling-node mass and the rank-mass invariant are 1-row
  * broadcast aggregates; driver state is the iteration counter only.
  * Rank frames are persisted per iteration so lineage stays O(1) deep.
  */
object Graph {

  /** Exact triangle count per node over an undirected edge list (directed
    * input is symmetrized; self-loops and duplicate edges dropped). The
    * standard two-join spelling on canonically ORIENTED edges (a < b): a
    * wedge join on the middle vertex then a closing-edge semi-join, so each
    * triangle {a<b<c} is found exactly once — never the 6x blowup of joining
    * unoriented edges. Scale shape: two shuffle joins keyed on node ids;
    * orientation bounds the wedge fan-out by high-degree nodes' FORWARD
    * degree (the classic skew mitigation). Returns (node, triangles). The
    * graph-health signal for link-quality features: nodes in dense local
    * clusters (high triangle count) vs link-farm stars (high degree, zero
    * closure). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(F.col(srcCol).as("a"), F.col(dstCol).as("b"))
      .filter(F.col("a").isNotNull && F.col("b").isNotNull && F.col("a") =!= F.col("b"))
    val oriented = raw.select(
        F.least(F.col("a"), F.col("b")).as("a"),
        F.greatest(F.col("a"), F.col("b")).as("b"))
      .distinct()
    // wedges a<b<c from oriented edges (a,b) and (b,c); close with (a,c)
    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"), F.col("e1.b") === F.col("e2.a"))
      .select(F.col("e1.a").as("a"), F.col("e1.b").as("b"), F.col("e2.b").as("c"))
    val triangles = wedges.alias("w").join(oriented.alias("e3"),
      F.col("w.a") === F.col("e3.a") && F.col("w.c") === F.col("e3.b"), "left_semi")
    triangles.select(F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).as("node"))
      .groupBy("node").agg(F.count(F.lit(1)).as("triangles"))
  }

  /** Damped PageRank over a directed edge list. Nodes are the union of
    * sources and destinations; duplicate edges are collapsed first (set
    * semantics, the standard formulation) unless `dedupEdges = false`
    * (multigraph: parallel edges weight the transition). Dangling nodes
    * (no out-edges) redistribute their mass uniformly, so total rank mass
    * stays 1 every iteration: r'(v) = (1-d)/N + d * (Σ_in r(u)/out(u) + D/N)
    * with D = Σ rank over dangling nodes.
    *
    * Returns (node, rank) with one row per node.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, damping: Double = 0.85,
               dedupEdges: Boolean = true): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    // Per-call registry, sized so NO generation of the lazy chain is ever
    // evicted before the caller's final action fills the caches: each
    // generation references its parent twice (dangling aggregate + contribs
    // join), so an eviction of k unmaterialized mid-chain links would
    // recompute with ~2^k fan-out. The shared session registry (cap 16,
    // also fed by Bpe.learnMerges) cannot give that guarantee when callers
    // interleave between this return and the caller's first action.
    val reg = new BoundedRegistry(iterations + 6)
    val e0 = edges.select(F.col(srcCol).as("__src__"), F.col(dstCol).as("__dst__"))
      .filter(F.col("__src__").isNotNull && F.col("__dst__").isNotNull)
    val e = reg.persistBounded(
      if (dedupEdges) e0.distinct() else e0)
    val nodes = reg.persistBounded(
      e.select(F.col("__src__").as("node"))
        .unionAll(e.select(F.col("__dst__").as("node")))
        .distinct())
    val outDeg = e.groupBy(F.col("__src__").as("node"))
      .agg(F.count(F.lit(1)).cast("double").as("__deg__"))
    // left join: dangling nodes carry null degree
    val base = reg.persistBounded(
      nodes.join(outDeg, Seq("node"), "left"))
    val n = nodes.agg(F.count(F.lit(1)).cast("double").as("__n__"))

    // For short iteration counts the per-generation materialize+unpersist
    // cycle costs more than it saves (each count() is a full job): persist
    // lazily and let the final action fill every generation's cache once
    // (broadcast subqueries evaluate parents in dependency order). Long
    // runs eagerly materialize so the previous generation can be released.
    val eager = iterations > 8
    var ranks = reg.persistBounded(base.crossJoin(F.broadcast(n))
      .select(F.col("node"), F.col("__deg__"), (F.lit(1.0) / F.col("__n__")).as("rank")))
    var i = 0
    while (i < iterations) {
      // 1-row aggregate: mass parked on dangling nodes this iteration
      val dangling = ranks.agg(
        F.coalesce(F.sum(F.when(F.col("__deg__").isNull, F.col("rank"))), F.lit(0.0))
          .as("__dm__"))
      val contribs = e
        .join(ranks.select(F.col("node").as("__src__"),
          (F.col("rank") / F.col("__deg__")).as("__c__")), Seq("__src__"))
        .groupBy(F.col("__dst__").as("node"))
        .agg(F.sum(F.col("__c__")).as("__in__"))
      val next = base
        .join(contribs, Seq("node"), "left")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(dangling))
        .select(F.col("node"), F.col("__deg__"),
          ((F.lit(1.0 - damping) / F.col("__n__")) +
            F.lit(damping) * (F.coalesce(F.col("__in__"), F.lit(0.0)) +
              F.col("__dm__") / F.col("__n__"))).as("rank"))
      if (eager) {
        reg.persistBounded(next)
        next.count() // materialize before releasing the input generation
        reg.release(ranks)
      } else reg.persistBounded(next)
      ranks = next
      i += 1
    }
    // Materialize the final generation once with a lineage cut, then
    // release every frame this call persisted: the registry's pins must
    // not outlive the call (repeated pageRank calls would otherwise grow
    // executor storage without bound — the invariant BoundedCache exists
    // for). The localCheckpoint blocks are ContextCleaner-managed: freed
    // when the caller drops the returned frame, not pinned forever.
    val out = ranks.select(F.col("node"), F.col("rank")).localCheckpoint(true)
    reg.releaseAll()
    out
  }
}

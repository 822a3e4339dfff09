package graft

/** Whole-query-map plan ratchet (round-12 verdict #8): every FUTURE
  * `SparkEntry.queries` addition is automatically covered — a query whose
  * physical plan contains a CartesianProduct fails here the day it lands,
  * the same unconditional posture OracleLintSpec applies to raw-double
  * oracle aggregates. (Unbounded global windows are pinned per-site by
  * GlobalWindowLintSpec — each library global window runs over a bounded
  * partials/stratum frame, which a generic plan-string scan cannot verify.)
  *
  * Streaming-family queries are excluded: building them runs streaming
  * jobs, and their plan invariants live in StreamingSpec. q_cross_join is
  * the one DELIBERATE cartesian (the reference's cross-join operator on
  * two bounded inputs) — everything else must shuffle or broadcast.
  */
class PlanRatchetSpec extends SparkSpec {

  private val deliberateCross = Set("q_cross_join")

  test("no query plans a CartesianProduct (whole-map, future-proof)") {
    // one shared build pass with CollectRatchetSpec (QueryBuildFixture) —
    // same coverage, half the staging/model-fit cost
    val offenders = QueryBuildFixture.built.flatMap {
      case (name, Right(df)) =>
        val plan = df.queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") && !deliberateCross(name)) Some(name)
        else None
      case (name, Left(e)) =>
        Some(s"$name (plan build failed: ${e.getClass.getSimpleName}: ${e.getMessage})")
    }
    assert(offenders.isEmpty,
      s"CartesianProduct (or broken plan build) in: ${offenders.mkString(", ")} — " +
        "broadcast the small side, join on a key, or add to deliberateCross with a written reason")
  }
}

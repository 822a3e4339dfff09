package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ratchet for the float-aggregate exact-hash hazard (see OracleLint).
  * Round 10's q_salted_join failure is the motivating case: a plan hint
  * changed double accumulation order and broke the driver's exact hash
  * while rtol-level values still matched. */
class OracleLintSpec extends AnyFunSuite {

  test("no NEW unreviewed raw-float aggregates in oracle SQL") {
    val fresh = OracleLint.unreviewed(SparkEntry.oracleSql)
    assert(fresh.isEmpty,
      s"new raw-DOUBLE sum/avg without decimal cast/round: ${fresh.toSeq.sorted.mkString(", ")} — " +
        "apply CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) on BOTH sides " +
        "(see q_bucketed_join / q_salted_join in Queries7)")
  }

  test("reviewed allowlist carries no stale entries") {
    val current = OracleLint.hazards(SparkEntry.oracleSql)
    val stale = OracleLint.reviewedHazards -- current
    assert(stale.isEmpty,
      s"allowlisted queries no longer hazardous (remove from reviewedHazards): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("q_salted_join uses the decimal discipline on both sides") {
    // The round-10 failure: keep it fixed. Engine side is covered by the
    // driver hash; here pin the oracle text so a revert is loud.
    val sql = SparkEntry.oracleSql("q_salted_join").toUpperCase
    assert(sql.contains("DECIMAL"), "q_salted_join oracle lost its decimal cast")
    assert(!OracleLint.hasFloatAggHazard(SparkEntry.oracleSql("q_salted_join")))
  }

  test("detector: window aggregates are exempt, bare sums are not") {
    assert(OracleLint.hasFloatAggHazard("SELECT sum(l_extendedprice) FROM lineitem"))
    assert(OracleLint.hasFloatAggHazard("SELECT avg(value) AS v FROM events GROUP BY 1"))
    assert(!OracleLint.hasFloatAggHazard(
      "SELECT sum(value) OVER (PARTITION BY k ORDER BY ts) FROM events"))
    assert(!OracleLint.hasFloatAggHazard(
      "SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders"))
    assert(!OracleLint.hasFloatAggHazard("SELECT sum(round(value, 2)) FROM events"))
    assert(!OracleLint.hasFloatAggHazard("SELECT sum(l_orderkey) FROM lineitem"))
  }
}

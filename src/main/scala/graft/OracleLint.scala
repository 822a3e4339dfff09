package graft

/** Static lint over `SparkEntry.oracleSql`: find queries whose oracle SQL
  * aggregates a raw DOUBLE column with `sum`/`avg` and no decimal cast or
  * rounding. The driver's correctness gate hashes values EXACTLY, so such a
  * query's green hash depends on Spark's floating-point accumulation order
  * matching DuckDB's to the ulp — which holds only while both plans stay
  * byte-stable. Round 10 proved the hazard: adding `.hint("shuffle_hash")`
  * to q_salted_join changed the partial-agg order and broke its hash while
  * every value still matched at rtol 1e-5 (see Queries7.qSaltedJoin and
  * VERDICT round 10 §What's wrong).
  *
  * Window aggregates (`sum(x) OVER w`) are exempt: the frame order is pinned
  * by the window spec, so both engines accumulate in the same sequence and a
  * plan change cannot reorder the addition.
  *
  * As of round 12 the lint is UNCONDITIONAL: the 32 legacy hazards were all
  * converted to the decimal discipline (exact sums; means as exact-sum ÷
  * count; integer-counting sums respelled as `count(CASE ...)`; skew/kurt
  * via DuckDB's normalized built-ins). [[reviewedHazards]] stays only as the
  * (empty) escape hatch — any entry added to it must carry a written review.
  */
object OracleLint {
  /** DOUBLE-typed columns in the driver testdata (TESTDATA.md schema). */
  val doubleCols: Set[String] = Set(
    "c_acctbal", "l_discount", "l_extendedprice", "l_quantity", "l_tax",
    "o_totalprice", "p_retailprice", "s_acctbal", "value")

  /** Escape hatch for individually-reviewed hazards. EMPTY since round 12
    * (the 32 legacy entries were converted to the decimal discipline). Any
    * future entry must carry a written review of why the raw-double
    * aggregate's hash is plan-order-safe. */
  val reviewedHazards: Set[String] = Set.empty

  private val aggStart = "(?i)\\b(sum|avg)\\s*\\(".r

  /** True if `sql` contains a non-window sum/avg over a raw double column
    * with no DECIMAL cast or round() inside the aggregate argument. */
  def hasFloatAggHazard(sql: String): Boolean = {
    aggStart.findAllMatchIn(sql).exists { m =>
      var i = m.end
      var depth = 1
      val start = i
      while (i < sql.length && depth > 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      val inner = sql.substring(start, math.max(start, i - 1))
      val up = inner.toUpperCase
      val rest = sql.substring(math.min(i, sql.length)).dropWhile(_.isWhitespace)
      val exempt = up.contains("DECIMAL") || up.contains("ROUND(") ||
        rest.toUpperCase.startsWith("OVER")
      !exempt && doubleCols.exists(c => s"\\b$c\\b".r.findFirstIn(inner).isDefined)
    }
  }

  /** Query names whose oracle SQL carries the hazard. */
  def hazards(oracle: Map[String, String]): Set[String] =
    oracle.collect { case (name, sql) if hasFloatAggHazard(sql) => name }.toSet

  /** Hazards not yet reviewed — must be empty; enforced by OracleLintSpec
    * and warned about by Verify. */
  def unreviewed(oracle: Map[String, String]): Set[String] =
    hazards(oracle) -- reviewedHazards
}

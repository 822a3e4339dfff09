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
  * Queries in [[reviewedHazards]] have been individually reviewed — each has
  * held an exact hash for many rounds on a stable plan, and converting them
  * (decimal-cast both sides) is deferred until a plan change is actually
  * made. The ratchet: touching such a query's plan means either converting
  * it to the q_bucketed_join decimal discipline or re-reviewing; ADDING a
  * new raw-float aggregate fails OracleLintSpec outright.
  */
object OracleLint {
  /** DOUBLE-typed columns in the driver testdata (TESTDATA.md schema). */
  val doubleCols: Set[String] = Set(
    "c_acctbal", "l_discount", "l_extendedprice", "l_quantity", "l_tax",
    "o_totalprice", "p_retailprice", "s_acctbal", "value")

  /** Reviewed-and-accepted existing hazards (round 11 audit). Each is a
    * non-window sum/avg over a raw DOUBLE whose Spark and DuckDB plans have
    * produced identical hashes since the query landed. Do not add to this
    * list — new queries must use the decimal discipline
    * (`CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` on both sides). */
  val reviewedHazards: Set[String] = Set(
    "q1_agg", "q6_filter", "q_agg_filter", "q_concat", "q_csv_roundtrip",
    "q_cut", "q_describe", "q_dt_strftime", "q_dt_trunc", "q_gbd_closed",
    "q_gbd_int", "q_gbd_monthly", "q_gbd_sliding", "q_group_by_dynamic",
    "q_group_expr_key", "q_join_agg", "q_join_full", "q_join_left",
    "q_null_count", "q_partition_by", "q_pivot", "q_search_sorted",
    "q_selectors", "q_skew_kurt", "q_sql", "q_streaming_session",
    "q_streaming_sink", "q_streaming_window", "q_unpivot", "q_upsample",
    "q_when_then", "q_with_context")

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

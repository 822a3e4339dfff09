package graft.ml

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Batch sessionization (beyond-reference; the batch twin of
  * [[graft.streaming.Streaming]]'s session windows): assign an id to each
  * run of per-key events separated by gaps no larger than `gap`. The
  * classic gaps-and-islands shape — one shuffle on the keys, a lag to flag
  * session starts, a running sum to number them. Fully declarative and
  * per-key partitioned, so it scales with key cardinality like any window.
  */
object Sessionize {

  /** Add `session` (0-based per key) to `df`: a new session starts at the
    * first event of a key and whenever the gap from the previous event
    * exceeds `gapMicros` (strictly greater, matching the streaming
    * session-window merge boundary: events exactly `gap` apart merge). */
  def assign(df: DataFrame, tsCol: String, keyCols: Seq[String],
             gapMicros: Long, out: String = "session"): DataFrame = {
    require(keyCols.nonEmpty, "sessionize: at least one key column (keyless " +
      "global sessionization would funnel all events through one task)")
    val ts = F.unix_micros(F.col(tsCol).cast("timestamp"))
    val w = Window.partitionBy(keyCols.map(F.col): _*).orderBy(ts)
    val prev = F.lag(ts, 1).over(w)
    val isStart = F.when(prev.isNull || ts - prev > gapMicros, 1L).otherwise(0L)
    // RANGE frame, not ROWS: tied timestamps must all see the same running
    // start-count (exactly one tied row carries the start flag, in an
    // arbitrary tie order) — a ROWS frame would split ties nondeterministically
    df.withColumn(out,
      F.sum(isStart).over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Per-session summary: bounds, event count, and duration in µs. */
  def stats(sessions: DataFrame, tsCol: String, keyCols: Seq[String],
            sessionCol: String = "session"): DataFrame = {
    val ts = F.unix_micros(F.col(tsCol).cast("timestamp"))
    sessions.groupBy((keyCols :+ sessionCol).map(F.col): _*)
      .agg(
        F.min(ts).as("start_us"),
        F.max(ts).as("end_us"),
        F.count(F.lit(1)).as("n_events"),
        (F.max(ts) - F.min(ts)).as("duration_us"))
  }
}

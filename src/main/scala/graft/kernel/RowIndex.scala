package graft.kernel

import org.apache.spark.sql.{DataFrame, functions => F}

/** Hidden monotonic row-index discipline (SURVEY §7 "hard parts").
  *
  * Polars frames are ordered; Spark relations are not. Frames attach this
  * column lazily — only when an order-dependent op (shift/head/slice/reverse/
  * cum without `over`, with_row_index) actually needs it — so scans keep full
  * pushdown/pruning in the common path.
  *
  * `monotonically_increasing_id` is monotonic in (partitionId, offset); for a
  * deterministic file scan this reproduces file order without collapsing
  * parallelism. It is materialized as a real column *before* any window so the
  * value is fixed pre-shuffle (a window's orderBy expression evaluated
  * post-exchange would be nondeterministic).
  */
object RowIndex {
  val name = "__graft_idx__"

  def attach(df: DataFrame): DataFrame =
    if (df.columns.contains(name)) df
    else df.withColumn(name, F.monotonically_increasing_id())

  /** Attach a dense 0-based index (needed when arithmetic on the index matters,
    * e.g. gather_every / slice).
    *
    * Two passes like RDD zipWithIndex (a count job, then the main job) but the
    * frame stays in Tungsten/codegen the whole way: pass 1 collects only
    * per-partition counts (numPartitions rows); pass 2 computes
    * `offset(partition) + local_position` where local_position is the low 33
    * bits of `monotonically_increasing_id` (its layout is pid << 33 | offset).
    * No Row conversion, no loss of columnar scan batching, partition
    * parallelism preserved — the shape that survives a 1000-executor scale-up. */
  def attachDense(df: DataFrame): DataFrame =
    if (df.columns.contains(name)) df
    else {
      // narrow count pass over InternalRows — no shuffle, no Row conversion
      val counts = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator((pid, n))
      }.collect().sortBy(_._1)
      if (counts.isEmpty) df.withColumn(name, F.lit(0L))
      else {
        var acc = 0L
        val offsets: Map[Int, Long] =
          counts.map { case (p, n) => val o = acc; acc += n; (p, o) }.toMap
        val localMask = (1L << 33) - 1
        df.withColumn(name,
          F.element_at(F.typedLit(offsets), F.spark_partition_id()) +
            F.monotonically_increasing_id().bitwiseAND(F.lit(localMask)))
      }
    }

  def drop(df: DataFrame): DataFrame =
    if (df.columns.contains(name)) df.drop(name) else df
}

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
    * Must run both zip passes (count + indexed map) over ONE lineage so the
    * partition boundaries agree — two independent executions of a sorted plan
    * can sample different range-partition bounds, silently misaligning the
    * index. [[org.apache.spark.sql.GraftInternalOps.zipWithDenseIndex]] does
    * the zip over InternalRows, so rows stay in the Tungsten binary format
    * (no external-Row boxing) while keeping zipWithIndex's shuffle reuse and
    * partition parallelism. */
  def attachDense(df: DataFrame): DataFrame =
    if (df.columns.contains(name)) df
    else org.apache.spark.sql.GraftInternalOps.zipWithDenseIndex(df, name)

  def drop(df: DataFrame): DataFrame =
    if (df.columns.contains(name)) df.drop(name) else df

  /** Drop any stale hidden index/bucket, then attach fresh. Kernel entry
    * points that impose their own order (`orderBy(col)` then attach) MUST use
    * this: `attach` is a no-op when `__graft_idx__` is already present, so a
    * frame arriving with the index attached would have its scan buckets driven
    * by the stale pre-sort order — silently wrong fills. */
  def reattachOrdered(df: DataFrame, order: org.apache.spark.sql.Column*): DataFrame =
    attach(df.drop(name, graft.kernel.Scan.BUCKET, graft.kernel.Scan.POS).orderBy(order: _*))
}

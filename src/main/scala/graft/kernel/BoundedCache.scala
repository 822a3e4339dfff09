package graft.kernel

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded registry for DataFrames persisted by iterative operators
  * (PageRank generations, BPE word tables) — the DataFrame sibling of
  * [[Ewm]]'s RDD registry: many calls in one long-lived session must not
  * pin unbounded executor storage. Evicting unpersists; a later
  * materialization of an evicted frame just recomputes from lineage (the
  * iterative callers only ever read each generation once or twice). */
object BoundedCache {
  private val persisted = new java.util.ArrayDeque[DataFrame]()

  def persistBounded(df: DataFrame, cap: Int = 16): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    persisted.addLast(df)
    while (persisted.size > cap) {
      try persisted.removeFirst().unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    df
  }

  /** Explicit release (drops from the registry if present). */
  def release(df: DataFrame): Unit = synchronized {
    try df.unpersist(blocking = false)
    catch { case scala.util.control.NonFatal(_) => () }
    persisted.remove(df)
  }
}

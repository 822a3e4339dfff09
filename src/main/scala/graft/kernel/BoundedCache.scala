package graft.kernel

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded registry for DataFrames persisted by iterative operators
  * (PageRank generations, BPE word tables) — the DataFrame sibling of
  * [[Ewm]]'s RDD registry: many calls in one long-lived session must not
  * pin unbounded executor storage. Evicting unpersists; a later
  * materialization of an evicted frame just recomputes from lineage (the
  * iterative callers only ever read each generation once or twice).
  *
  * Lazily-persisted generation CHAINS (each generation referencing its
  * parent more than once, nothing materialized until the final action) must
  * NOT share a registry with other callers: an interleaved caller evicting
  * an unmaterialized mid-chain generation makes the final action recompute
  * it with multiplicative fan-out (~2^k for k evicted links). Such callers
  * instantiate their own [[BoundedRegistry]] sized to their chain length;
  * the shared [[BoundedCache]] default stays for eagerly-materialized or
  * single-generation use.
  */
class BoundedRegistry(defaultCap: Int) {
  private val persisted = new java.util.ArrayDeque[DataFrame]()

  def persistBounded(df: DataFrame, cap: Int = defaultCap): DataFrame = synchronized {
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

  /** Release everything still registered (end-of-call cleanup for
    * per-call registries). */
  def releaseAll(): Unit = synchronized {
    while (!persisted.isEmpty) {
      try persisted.removeFirst().unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

/** The shared session-wide registry. */
object BoundedCache extends BoundedRegistry(16)

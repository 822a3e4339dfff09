package graft.kernel

import org.apache.spark.sql.{DataFrame, functions => F}

/** Skew mitigation for extreme hot keys.
  *
  * AQE's skew-join (on by default in the mains) splits oversized shuffle
  * partitions at runtime and covers moderate skew with zero code. Explicit
  * salting is the escalation path when single keys are so hot that even a
  * split partition exceeds executor memory, or when the skewed side feeds a
  * sort-merge join repeatedly: scatter the hot key across `salts` sub-keys so
  * its rows land on `salts` tasks instead of one.
  */
object Skew {

  /** Join `large` (skewed) with `small` on `key`, scattering each large-side
    * row into one of `salts` buckets (deterministic content hash — stable
    * across task retries, unlike rand()) and replicating the small side once
    * per bucket. Supported join types: inner, left. Cost: small side is
    * `salts`× duplicated — keep `salts` ≲ 32 and the small side genuinely
    * small (it is usually broadcast anyway; salting matters when the small
    * side is too big to broadcast but far smaller than the large side). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    val salt = F.pmod(F.xxhash64(large.columns.map(F.col).toSeq: _*), F.lit(salts.toLong))
    val l = large.withColumn("__graft_salt__", salt)
    val r = small.withColumn("__graft_salt__",
      F.explode(F.sequence(F.lit(0L), F.lit(salts.toLong - 1))))
    l.join(r, Seq(key, "__graft_salt__"), joinType).drop("__graft_salt__")
  }
}

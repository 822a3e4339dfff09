package graft.ml

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, functions => F}

/** Corpus sampling strategies for training-data pipelines (beyond-reference):
  * stratified and hash-based sampling with exact, reproducible semantics.
  */
object Sampling {

  /** Exact stratified sample: for each stratum value, keep the first
    * `ceil(frac * stratum_count)` rows in `orderCol` order. Deterministic and
    * engine-reproducible (no RNG) — the shape used for fixed-seed ablations
    * and for the DuckDB oracle. One window shuffle keyed by stratum.
    * The threshold is IEEE-double `ceil(frac * n)` on purpose — the same
    * arithmetic SQL `ceil(n * frac)` computes — so a fraction whose product
    * rounds up a hair (0.07 * 100 = 7.000000000000001 → 8) reproduces
    * bit-for-bit against the oracle rather than against idealized decimal
    * math. Pass an exact binary fraction (k / 2^m) when the mathematical
    * count matters. */
  def stratifiedExact(df: DataFrame, stratumCol: String, frac: Double,
                      orderCol: String): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    val w = Window.partitionBy(F.col(stratumCol)).orderBy(F.col(orderCol))
    df.withColumn("__rn__", F.row_number().over(w))
      .withColumn("__n__", F.count(F.lit(1)).over(Window.partitionBy(F.col(stratumCol))))
      .filter(F.col("__rn__") <= F.ceil(F.col("__n__") * frac))
      .drop("__rn__", "__n__")
  }

  /** Hash-threshold sample: keep rows where the seeded xxhash64 of the key
    * lands below `frac` of the hash space. Stateless, no shuffle, stable
    * under reruns and across partitionings — the 100 TB-scale default (each
    * executor decides locally; expected fraction `frac` per stratum). */
  def hashSample(df: DataFrame, keyCol: String, frac: Double,
                 seed: Long = 42): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0, 1], got $frac")
    // map hash to [0,1) through the unsigned 64-bit space
    val u = (F.xxhash64(F.lit(seed), F.col(keyCol)).cast("decimal(20,0)")
      + F.lit(BigDecimal("9223372036854775808"))) / F.lit(BigDecimal("18446744073709551616"))
    df.filter(u < frac)
  }

  /** Per-stratum target-count downsampling ("data mixing"): given a map of
    * stratum -> target row count, keep the first `target` rows per stratum in
    * `orderCol` order (strata absent from the map are kept whole). The
    * building block for rebalancing domain/language mixes. */
  def capPerStratum(df: DataFrame, stratumCol: String,
                    targets: Map[String, Long], orderCol: String): DataFrame = {
    val w = Window.partitionBy(F.col(stratumCol)).orderBy(F.col(orderCol))
    val targetCol = targets.foldLeft(F.lit(Long.MaxValue)) { case (acc, (k, v)) =>
      F.when(F.col(stratumCol) === k, v).otherwise(acc)
    }
    df.withColumn("__rn__", F.row_number().over(w))
      .filter(F.col("__rn__") <= targetCol)
      .drop("__rn__")
  }
}

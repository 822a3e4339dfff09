package graft.io

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Physical-layout control for the 100 TB write path.
  *
  * Sorting a table by one key gives parquet min/max pruning on that key only;
  * interleaving the bits of several keys (Morton / Z-order) before a
  * range-partitioned sorted write bounds EVERY clustered column's min/max
  * range within each file, so selective filters on any of the keys skip most
  * files. This is the standard lakehouse clustering technique (public:
  * Morton 1966; widely described for Delta/Iceberg data skipping) expressed
  * with plain Catalyst bit arithmetic — fully codegen'd, no UDF.
  */
object Layout {

  /** Bit-interleaved z-value of already-normalized non-negative ints: bit i
    * of column j lands at position i*ncols + j. Columns must be in
    * [0, 2^bits); use [[zValueScaled]] for arbitrary numeric ranges. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63, "z-value must fit a signed long")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Normalize a column from [lo, hi] to [0, 2^bits) then z-interleave.
    * Pass per-column (lo, hi) from stats or domain knowledge. */
  def zValueScaled(cols: Seq[(Column, Double, Double)], bits: Int = 16): Column = {
    val scaled = cols.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      F.least(
        F.greatest(F.floor((c.cast("double") - lo) / span * ((1L << bits) - 1)), F.lit(0L)),
        F.lit((1L << bits) - 1L))
    }
    zValue(scaled, bits)
  }

  /** Z-order clustered parquet write: range-partition on the z-value (so
    * files tile the curve), sort within each partition, write. `files`
    * controls output granularity — at cluster scale set it so each file is
    * ~128 MB-1 GB. Stats (lo/hi per clustering column) are computed in one
    * pass unless supplied. */
  def zorderWrite(df: DataFrame, clusterCols: Seq[String], path: String,
                  files: Int = 8, bits: Int = 16,
                  ranges: Option[Seq[(Double, Double)]] = None): Unit = {
    val stats = ranges.getOrElse {
      val aggs = clusterCols.flatMap(c =>
        Seq(F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))))
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      clusterCols.indices.map { i =>
        require(!r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1),
          s"zorderWrite: no stats for '${clusterCols(i)}' (empty input or " +
            "all-null column) — pass explicit ranges or skip clustering")
        (r.getDouble(2 * i), r.getDouble(2 * i + 1))
      }
    }
    val z = zValueScaled(clusterCols.zip(stats).map { case (c, (lo, hi)) => (F.col(c), lo, hi) }, bits)
    df.withColumn("__z__", z)
      .repartitionByRange(files, F.col("__z__"))
      .sortWithinPartitions("__z__")
      .drop("__z__")
      .write.mode("overwrite").parquet(path)
  }
}

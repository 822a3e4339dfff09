package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables — the co-located join path for 100 TB pipelines.
  *
  * The reference is single-node so every join is "co-located"; on a cluster
  * the equivalent is hash-bucketed storage: two tables bucketed by the same
  * keys into the same bucket count join (and aggregate on those keys) with NO
  * exchange — the dominant cost of large joins disappears from the plan.
  * `BucketingSpec` pins the shuffle-free plan shape.
  *
  * Write once, join many: the bucket layout pays for itself on the first
  * repeated join against a fact table.
  */
object Bucketed {

  /** Save as a bucketed (optionally bucket-sorted) parquet table. Sorting by
    * the join keys additionally removes the per-task Sort from sort-merge
    * joins. */
  def write(df: DataFrame, table: String, keys: Seq[String], buckets: Int,
            sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}

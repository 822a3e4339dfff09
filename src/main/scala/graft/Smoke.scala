package graft

import org.apache.spark.sql.SparkSession

/** t1-style smoke: run the flagship `SparkEntry.entry` and print its rows —
  * the same check the driver performs. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // let AQE coalesce exchanges INSIDE cached plans too (off by default):
      // persisted iterative frames (PageRank generations, staged scores)
      // otherwise run every exchange at full shuffle parallelism, which at
      // toy scale is pure task-scheduling overhead and at cluster scale
      // forgoes AQE skew/coalesce handling for cached branches
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}

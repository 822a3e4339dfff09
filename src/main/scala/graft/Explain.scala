package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: print the formatted physical plan of named
  * queries (all when no names given) — used to audit pushdown / broadcast /
  * codegen coverage per the 100 TB design loop. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Dev profiling harness: run named queries once warm, print per-query
  * wall time + Spark job/stage counts (a high job count on small data =
  * fixed scheduling overhead, the local-bench bottleneck). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // let AQE coalesce exchanges INSIDE cached plans too (off by default):
      // persisted iterative frames (PageRank generations, staged scores)
      // otherwise run every exchange at full shuffle parallelism, which at
      // toy scale is pure task-scheduling overhead and at cluster scale
      // forgoes AQE skew/coalesce handling for cached branches
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QueryStage.reuseUnchanged = true
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, dir).count() // warm
      Thread.sleep(100)
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"$n%-24s $sec%7.3f s  jobs=${jobs.get}%-4d stages=${stages.get}")
    }
    spark.stop()
  }
}

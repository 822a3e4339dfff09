package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch probe: count Spark jobs/stages/tasks for q_pagerank at a given SF
  * — the measurement behind the toy-scale scheduling-floor analysis in
  * BASELINE.md. Not part of the driver contract. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("PR_CACHED_AQE", "false"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PR_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger; val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_pagerank")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    Thread.sleep(500)
    jobs.set(0); stages.set(0); tasks.set(0)
    val t = run()
    Thread.sleep(500)
    println(f"PR_PROBE time=${t}%.3f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    spark.stop()
  }
}

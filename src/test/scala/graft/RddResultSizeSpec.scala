package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftTestListenerOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{functions => F}

/** RDD-action extension of the collect ratchet (round-15 directive #6):
  * CollectRatchetSpec scans DataFrame collects via QueryExecutionListener,
  * but the treeReduce/collect KERNELS (Quantiles histogram partials, Ewm
  * per-partition carry summaries, PCA moment accumulators) run raw RDD jobs
  * that never pass through it. This pins their driver-boundedness
  * MECHANICALLY: run each kernel at N and 10N rows with the SAME partition
  * count and assert the bytes shipped to the driver (task resultSize summed
  * over the window) stay flat — per-partition constant-size summaries ship
  * the same bytes regardless of row count, while an accidental
  * rows-to-driver regression scales ~10x and trips the bound. */
class RddResultSizeSpec extends SparkSpec {

  /** Total task-result bytes delivered to the driver while `body` runs. */
  private def resultBytes(body: => Unit): Long = {
    val total = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) total.addAndGet(e.taskMetrics.resultSize)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      GraftTestListenerOps.flushListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    total.get
  }

  private val Parts = 8
  // resultSize includes fixed per-task accumulator/metrics overhead, so
  // "flat" means well under the 10x a rows-to-driver leak would show; the
  // small headroom absorbs run-to-run metric jitter
  private val FlatFactor = 2.0

  private def rows(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong).select(
      F.col("id"),
      (F.rand(7) * 100).as("v"),
      F.transform(F.sequence(F.lit(1), F.lit(8)),
        i => (F.rand(11) + i).cast("float")).as("emb"))
      .repartition(Parts)
  }

  test("Quantiles.orderStats ships flat driver bytes at 10x rows") {
    // the histogram REFINEMENT pass count grows with the distinct-value
    // density around the target rank, so the probe uses a fixed 101-value
    // domain at both sizes: per-pass payload is #partitions x #bands x
    // bucket longs regardless of rows, and with cardinality held constant
    // the pass count is too — a rows-to-driver leak still scales ~10x
    val req = Seq(graft.kernel.Quantiles.Req("v",
      graft.kernel.Quantiles.quantileRanks(0.37)))
    def coarse(n: Int) = rows(n).withColumn("v", F.round(F.col("v"), 0))
    val small = coarse(5000).cache(); small.count()
    val big = coarse(50000).cache(); big.count()
    try {
      val b1 = resultBytes(graft.kernel.Quantiles.orderStats(small, req))
      val b10 = resultBytes(graft.kernel.Quantiles.orderStats(big, req))
      assert(b10 <= b1 * FlatFactor,
        s"quantile kernel driver bytes grew with data: $b1 -> $b10")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("Ewm keyless kernel ships flat driver bytes at 10x rows") {
    val small = rows(5000).cache(); small.count()
    val big = rows(50000).cache(); big.count()
    try {
      // count() the result so the kernel's internal collect() of partition
      // summaries runs inside the measured window
      val b1 = resultBytes(
        graft.kernel.Ewm.ewm(small, "v", "id", outputs = Seq("mean")).count())
      val b10 = resultBytes(
        graft.kernel.Ewm.ewm(big, "v", "id", outputs = Seq("mean")).count())
      // the OUTPUT count scan's own tasks also report resultSize; with the
      // same partition count both runs carry the same fixed task overhead,
      // so the flat bound still separates summary-size from data-size
      assert(b10 <= b1 * FlatFactor,
        s"ewm kernel driver bytes grew with data: $b1 -> $b10")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("Pca.fit ships flat driver bytes at 10x rows") {
    val small = rows(5000).cache(); small.count()
    val big = rows(50000).cache(); big.count()
    try {
      val b1 = resultBytes(graft.ml.Pca.fit(small, "emb", 2))
      val b10 = resultBytes(graft.ml.Pca.fit(big, "emb", 2))
      assert(b10 <= b1 * FlatFactor,
        s"pca moment kernel driver bytes grew with data: $b1 -> $b10")
    } finally { small.unpersist(); big.unpersist() }
  }
}

package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame => SDF}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** ONE shared build pass over the whole query map for the whole-map ratchet
  * specs (PlanRatchetSpec + CollectRatchetSpec). Building all 206 queries
  * runs their staging writes and model fits at sf0.001 (~65 s a pass), and
  * each ratchet used to pay that pass independently — the fixture builds
  * once and both ratchets read from it, with identical verification power:
  * the collect listener is registered here, around the ONLY build, and the
  * shared async listener bus is drained after every query so each captured
  * collect is attributed to the query that ran it (late delivery under
  * suite-wide load otherwise bleeds attribution into the next name — the
  * r15 full-suite-only CollectRatchetSpec flake).
  *
  * Streaming-family queries are excluded as in both ratchets (building them
  * runs streaming jobs; their invariants live in StreamingSpec).
  */
object QueryBuildFixture {
  final case class CapturedCollect(query: String, fn: String,
                                   optimized: LogicalPlan, physical: String)

  val sfDir = "/root/testdata/sf0.001"

  /** (per-query build result, every driver-side collect captured during the
    * builds). Lazy: whichever ratchet runs first pays the single pass. */
  lazy val (built, collects): (Seq[(String, Either[Throwable, SDF])], Seq[CapturedCollect]) = {
    val spark = SparkSpec.session
    val captured = new ConcurrentLinkedQueue[CapturedCollect]()
    @volatile var current = ""
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        if (funcName == "collect" || funcName == "collectAsList" || funcName == "toLocalIterator")
          captured.add(CapturedCollect(current, funcName, qe.optimizedPlan, qe.executedPlan.toString))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    // LiveListenerBus.waitUntilEmpty() is private[spark] at the Scala level
    // but public in bytecode — reflection reaches it without a Spark-package
    // shim. Draining after each build makes collect attribution exact.
    def drainListenerBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .foreach(_.invoke(bus))
    }
    spark.listenerManager.register(listener)
    try {
      val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("q_streaming"))
      val out = names.map { name =>
        current = name
        val r =
          try Right(SparkEntry.queries(name)(spark, sfDir))
          catch { case e: Throwable => Left(e): Either[Throwable, SDF] }
        drainListenerBus()
        (name, r)
      }
      import scala.jdk.CollectionConverters._
      (out, captured.asScala.toSeq)
    } finally spark.listenerManager.unregister(listener)
  }
}

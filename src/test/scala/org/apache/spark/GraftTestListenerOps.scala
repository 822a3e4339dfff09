package org.apache.spark

/** Test-only bridge into `private[spark]` listener plumbing: flushing the
  * async listener bus is required before reading metrics a SparkListener
  * accumulated for a just-finished job (events are delivered on a separate
  * thread; without the flush a fast test reads zero). */
object GraftTestListenerOps {
  def flushListeners(sc: SparkContext, timeoutMillis: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

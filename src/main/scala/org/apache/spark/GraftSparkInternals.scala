package org.apache.spark

/** `private[spark]` access bridge (same pattern as `sql.GraftSqlInternals`):
  * the listener bus delivers events on an async queue, so a benchmark that
  * reads listener-accumulated metrics right after its last action must drain
  * the bus first or silently lose the trailing task-end events.
  */
object GraftSparkInternals {
  /** Block until all posted listener events are delivered (or timeout). */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

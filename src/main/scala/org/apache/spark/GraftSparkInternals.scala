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

  /** Total events shed by the bounded async listener queues (summed across
    * queues; each `AsyncEventQueue` registers a
    * `queue.<name>.numDroppedEvents` counter). Nonzero means listener-
    * accumulated metrics under-count — the bench emits this so
    * under-attribution is itself visible instead of masquerading as a plan
    * change.
    */
  def listenerEventsDropped(sc: SparkContext): Long = {
    import scala.jdk.CollectionConverters._
    sc.listenerBus.metrics.metricRegistry.getCounters().asScala.collect {
      case (name, c) if name.endsWith("numDroppedEvents") => c.getCount
    }.sum
  }

  /** Cumulative count of whole-stage/expression codegen COMPILATIONS (each
    * is one janino compile of generated Java). Exact and monotonic — a
    * per-query delta attributes compile churn to the query that paid it;
    * plan drift changes this deterministically, environment noise does not.
    */
  def codegenCompilations: Long =
    org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
}

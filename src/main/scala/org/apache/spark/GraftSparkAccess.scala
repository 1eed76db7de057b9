package org.apache.spark

/** Bridge to one `private[spark]` member the bench/profiling tools need:
  * `SparkContext.listenerBus`. Draining the async listener bus between
  * timed queries makes per-query metric attribution exact (task-end
  * events for query N land in query N's tally, not query N+1's) without
  * sleeps. Measurement-tooling-only — the library itself never calls
  * into this package.
  */
object GraftSparkAccess {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}

package org.apache.spark

/** Test-only accessor for the `private[spark]` listener bus: probes that
  * read task metrics off a SparkListener need a deterministic "all events
  * delivered" barrier, not a fixed sleep. This is the same mechanism
  * Spark's own test suites use (`sc.listenerBus.waitUntilEmpty`).
  */
object GraftListenerDrain {
  /** Block until every queued listener event has been delivered (or the
    * timeout elapses, throwing TimeoutException).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

package org.apache.spark

/** Main-tree twin of the test tree's GraftListenerDrain: deterministic
  * listener-bus barrier for instrument mains (JobCountProbe, RecallProbe)
  * that read listener-collected state after an action returns.
  */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

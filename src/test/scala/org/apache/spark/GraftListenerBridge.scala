package org.apache.spark

/** Test-scope bridge into the listener bus: job-count budgets must
  * drain every queued event before reading their counter, and
  * `SparkContext.listenerBus` is `private[spark]`. */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

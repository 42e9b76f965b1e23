package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`; the job-wave specs need
  * to drain it before reading their event counters, so this one-liner
  * lives in the spark package (test tree only).
  */
object TestListenerShim {
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

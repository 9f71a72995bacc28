package org.apache.spark

/** Test-only bridge into package-private SparkContext internals:
  * listener events are delivered asynchronously, so a spec that reads
  * task metrics after an action must drain the bus first.
  */
object GraftTestHooks {
  def flushListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}

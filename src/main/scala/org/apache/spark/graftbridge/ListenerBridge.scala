package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** The second (and last) `private[spark]` doorway graft needs, next to
  * sql.graftbridge.PlanBridge: listener events are delivered
  * asynchronously on the bus thread, so a resource audit that reads its
  * task-metric accumulations right after an action returns must drain
  * the bus first or it undercounts the action's final tasks. Spark
  * exposes no public flush — `SparkContext.listenerBus` is
  * private[spark] — hence this one-line bridge.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

package org.apache.spark

/** Bridge to the spark-package-private listener-bus flush. Listener events
  * (stage-completed task metrics) are delivered asynchronously; a benchmark
  * attributing per-query metric deltas must drain the bus between queries or
  * a stage finishing late bleeds its bytes into the next query's delta.
  */
object GraftListenerBridge {
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

package org.apache.spark

/** Package-private-access bridge (same pattern as
  * org.apache.spark.sql.GraftColumnBridge): the listener bus is
  * `private[spark]`, but the bench needs to drain it so per-query
  * task-metric deltas land on the query that produced them.
  */
object GraftListenerBridge {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

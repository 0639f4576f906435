package org.apache.spark

/** Test-only bridge into the private[spark] surface: deterministically
  * drain the async listener bus so LazyBuildSpec's job-count
  * assertions observe every event posted before the drain returned.
  * Same pattern as sql.GraftSqlBridge (main), kept in test scope. */
object GraftTestBridge {
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(60000L)
}

package org.apache.spark

/** Bench-only escape hatch into `private[spark]` surface (the pattern
  * of [[org.apache.spark.sql.GraftSqlShim]]): the listener-bus drain,
  * so a per-query task-metrics snapshot is attributed to the query
  * that produced the tasks rather than to whatever query happens to be
  * running when the async event queue flushes (VERDICT r13 #1 — the
  * q57 intra-battery variance diagnosis needs per-run spill counters
  * that are actually per-run).
  */
object GraftSparkShim {
  /** Block until every queued listener event is delivered (bounded —
    * a wedged bus must not wedge the bench). */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: Exception => () }
}

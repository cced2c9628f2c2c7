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

  /** Drop the session-shared FileStatusCache (file listings of every
    * table/path read so far). Index-building queries flood it with
    * their segment listings and LRU-evict earlier entries; clearing it
    * between timed bench runs makes each query re-list its own inputs
    * (sub-ms on local fixtures) instead of paying an unpredictable
    * eviction pattern set by whichever queries ran before it —
    * battery-order interference, measured on q29 after the q298/q299
    * builds. */
  def clearFileStatusCache(): Unit =
    try org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
    catch { case _: Exception => () }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persist registry — the engine-wide unpersist
  * discipline (VERDICT r9 #3 / ADVICE r8 #4).
  *
  * Why it exists: a query function returns a LAZY frame, so an
  * intermediate it persisted (because two branches of the final plan
  * consume it) cannot be unpersisted inside the function — the cache
  * only fills when the CALLER materializes. But `Dataset.persist`
  * registers the plan in the session's CacheManager, which holds a
  * strong reference: "unpersist falls to the ContextCleaner" never
  * actually happens for these, and in a long-lived session library
  * calls accumulate storage-pool blocks without bound.
  *
  * The contract that fixes it:
  *  - query/operator code persists intermediates through
  *    [[persist]] (or the `.persistT` extension) instead of bare
  *    `.persist()`;
  *  - the HARNESS (Verify / Bench / LintNew / a user's job runner)
  *    calls [[release]] once the query's result is materialized —
  *    every tracked frame is unpersisted, the registry entry dropped.
  *
  * `release` is cheap (unpersist(blocking=false)) and idempotent —
  * frames an operator already unpersisted itself are no-ops. Standing
  * caches with their OWN lifecycle (a `VectorIndex`'s parquet cells,
  * StreamSinks' per-batch persists released inside the batch) stay
  * off this registry on purpose: release() must never yank state out
  * from under a concurrent streaming batch.
  *
  * Keying is per SparkSession identity, so concurrent sessions (tests)
  * release independently. Frames registered but never released behave
  * exactly like the pre-discipline engine — no worse — plus one
  * registry entry per session.
  */
object TrackedCache {

  // Keyed by SESSION IDENTITY via [[SessionRef]] (ADVICE r10: bare
  // identityHashCode keys can collide across live sessions, making
  // release(sparkA) unpersist sparkB's frames).
  private val registry = new java.util.concurrent.ConcurrentHashMap[
    SessionRef, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  private def key(s: SparkSession): SessionRef = new SessionRef(s)

  /** Drop entries of stopped sessions (their unpersist is a no-op and
    * the queued frames would otherwise pin plans forever). Called
    * opportunistically on every [[persist]] — the registry holds one
    * entry per live session, so the scan is trivial. */
  private def sweep(): Unit = {
    val it = registry.keySet().iterator()
    while (it.hasNext) if (it.next().stopped) it.remove()
  }

  /** `df.persist()` + register for a later session-wide [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    sweep()
    df.persist()
    registry.computeIfAbsent(key(df.sparkSession),
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  /** Unpersist every tracked frame of `spark`; returns how many. */
  def release(spark: SparkSession): Int = {
    val q = registry.remove(key(spark))
    if (q == null) 0
    else {
      var n = 0
      val it = q.iterator()
      while (it.hasNext) { it.next().unpersist(blocking = false); n += 1 }
      n
    }
  }

  /** Run `body` and release ONLY the frames it registered — the
    * streaming-sink scope (ADVICE r14 #3): a long-running sink has no
    * harness release() between micro-batches, so its per-batch probe
    * persists would accumulate without bound; but a session-WIDE
    * release from inside the sink could yank a concurrent query's
    * tracked frames mid-plan. Snapshot the registry before the batch,
    * release only what the batch added. Residual caveat, stated: a
    * frame a CONCURRENT caller registers while `body` runs is
    * indistinguishable from the batch's own and is released with them
    * — scoped release narrows the race from "always" to "registered
    * during this batch"; same-session concurrent persistT callers
    * remain outside the contract (foreachBatch itself is serial). */
  def scoped[A](spark: SparkSession)(body: => A): A = {
    val before = new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()
    val q0 = registry.get(key(spark))
    if (q0 != null) {
      val it = q0.iterator()
      while (it.hasNext) before.put(it.next(), java.lang.Boolean.TRUE)
    }
    try body
    finally {
      val q = registry.get(key(spark))
      if (q != null) {
        val it = q.iterator()
        while (it.hasNext) {
          val f = it.next()
          if (!before.containsKey(f)) { f.unpersist(blocking = false); it.remove() }
        }
      }
    }
  }

  /** Tracked-but-unreleased frame count (CacheDisciplineSpec probe). */
  def pending(spark: SparkSession): Int = {
    val q = registry.get(key(spark))
    if (q == null) 0 else q.size()
  }

  /** `.persistT` — the tracked spelling of `.persist()`. */
  implicit class TrackOps(private val df: DataFrame) extends AnyVal {
    def persistT: DataFrame = TrackedCache.persist(df)
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders => SqlEncoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.types._

/** Structured Streaming slice over the `events` fixture (SURVEY.md §2.10
  * — ABSENT in the reference, driver-mandated extension).
  *
  * Design rule: every streaming aggregation shares its transform with the
  * batch twin (q21 in ParityQueries uses [[hourlyByType]] semantics), so
  * a batch query lifts to `readStream → transform → writeStream`
  * unchanged — watermark-compatible by construction.
  */
// Serializable: the sessionizer closures reference the shared merge
// helpers, which drags the module into the serialized task closure
object EventsStream extends Serializable {

  /** events schema with `ts` as raw nanos (fixture generations that
    * write TIMESTAMP(NANOS), which the vectorized reader only surfaces
    * as long under `spark.sql.legacy.parquet.nanosAsLong`). */
  val eventsNanosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of an events parquet directory. A streaming scan
    * needs an explicit schema, and the fixture has shipped `ts` as both
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across generations — so
    * sniff the on-disk type with a one-footer batch schema read, then
    * declare the matching stream schema. Integer `div` for nanos→micros:
    * epoch-nanos exceed double's 2^53 exact range. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Match Tables.events: surface NTZ-annotated micros fixtures as
    // plain TimestampType so watermarks/windows type-check identically.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val onDisk = spark.read.parquet(dir).schema
    if (onDisk("ts").dataType == LongType)
      spark.readStream
        .schema(eventsNanosSchema)
        .parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.readStream.schema(onDisk).parquet(dir)
  }

  /** Shared batch/streaming transform: tumbling 1-hour windows per
    * event_type. In streaming, partial aggregation state lives in the
    * state store keyed by (window, event_type) — bounded by the watermark
    * horizon, so state size is O(types × watermark/1h), not O(events). */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming variant: watermark bounds state + drops data later than
    * `watermark`; append mode emits each window once it is final. */
  def streamingHourly(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    hourlyByType(events.withWatermark("ts", watermark))

  /** Shared batch/streaming transform: SLIDING (hopping) windows —
    * each event lands in size/slide overlapping windows (a narrow
    * Generate before the aggregate, no extra shuffle). Batch twin:
    * q77. State per key is (window, type) within the watermark
    * horizon, so overlap multiplies state by size/slide, not by the
    * event volume. */
  def slidingByType(events: DataFrame, size: String = "30 minutes",
                    slide: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming sliding windows: append mode, windows emit when the
    * watermark passes their end. */
  def streamingSliding(events: DataFrame, size: String = "30 minutes",
                       slide: String = "10 minutes",
                       watermark: String = "1 hour"): DataFrame =
    slidingByType(events.withWatermark("ts", watermark), size, slide)

  /** Streaming exact dedup — the ingestion-side twin of
    * [[graft.dedup.Dedup.exactGroups]]: drop events whose key was
    * already seen, with state BOUNDED by the watermark horizon
    * (`dropDuplicatesWithinWatermark` evicts seen-keys older than the
    * watermark — plain dropDuplicates on a stream grows state forever,
    * which is the difference between a demo and a 100 TB ingest). */
  def streamingDedup(events: DataFrame, keys: Seq[String] = Seq("event_id"),
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream inner join: pair each `typeA` event with the same
    * user's `typeB` events within ±`withinMinutes`. Both sides carry a
    * watermark and the join condition bounds the time skew, so each
    * side's buffered state is evicted once the watermark passes
    * `ts + within` — the two requirements Structured Streaming needs
    * to run a stream-stream join with bounded state (an unbounded
    * stream-stream join buffers both streams forever).
    *
    * Same semantics in batch: [[graft.ops.RelationalOps.intervalJoin]]
    * on (user_id, |Δts| ≤ within) — the q65 oracle twin; the spec pins
    * the two to each other. */
  def streamStreamPairs(events: DataFrame, typeA: String = "click",
                        typeB: String = "view", withinMinutes: Int = 10,
                        watermark: String = "1 hour"): DataFrame = {
    val a = events.where(col("event_type") === typeA)
      .select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events.where(col("event_type") === typeB)
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b, col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") - expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("a_id"), col("b_id"),
        (unix_millis(col("b_ts")) - unix_millis(col("a_ts"))).as("dt_ms"))
  }

  /** LEFT-OUTER stream-stream join — [[streamStreamPairs]] plus the
    * semantics inner joins can't express: a `typeA` event with NO
    * `typeB` match within the window still emits, with nulls, but only
    * once the watermark passes `a_ts + within` (before that a match
    * could still arrive, so the row sits in the join state; eviction
    * is what proves the negative). This is the funnel-drop shape —
    * "clicks that never converted" — and the state bound is identical
    * to the inner join's: both sides evict at watermark − within.
    *
    * The null-match rows emit on WATERMARK ADVANCE, not on data
    * arrival — a finite stream's tail rows never emit until a later
    * event (or no-data micro-batch) pushes the watermark past them.
    * The spec pins exactly that: unmatched rows absent before the
    * push, present after, equal to the batch left interval join. */
  def streamStreamPairsLeftOuter(events: DataFrame, typeA: String = "click",
                                 typeB: String = "view", withinMinutes: Int = 10,
                                 watermark: String = "1 hour"): DataFrame = {
    val a = events.where(col("event_type") === typeA)
      .select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events.where(col("event_type") === typeB)
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b, col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") - expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        "leftOuter")
      .select(col("user_id"), col("a_id"), col("b_id"),
        (unix_millis(col("b_ts")) - unix_millis(col("a_ts"))).as("dt_ms"))
  }

  /** Stream-STATIC enrichment join — the remaining join shape next to
    * the stream-stream pair join above: each arriving event picks up
    * its key's attributes from a bounded dimension table. No watermark
    * and no join-state store needed (the static side is complete by
    * definition); the dimension is broadcast, so the stream side never
    * shuffles — per micro-batch this is exactly the batch broadcast
    * equi-join (J4), which is why the spec pins it to the batch twin.
    * At 100 TB-of-stream the static side is the small one by
    * construction; a large dimension becomes a stream-stream join or a
    * state-store lookup instead. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  // ------------------------------------------------- sessionization

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Open-session state carried between micro-batches. */
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)

  private def toSessions(userId: Long, sorted: Seq[Event], gapMs: Long): Seq[Session] = {
    if (sorted.isEmpty) return Nil
    val out = Seq.newBuilder[Session]
    var start = sorted.head; var last = sorted.head
    var n = 0L; var sum = 0.0
    for (e <- sorted) {
      if (e.ts.getTime - last.ts.getTime > gapMs) {
        out += Session(userId, start.ts, last.ts, n, sum)
        start = e; n = 0L; sum = 0.0
      }
      last = e; n += 1; sum += e.value
    }
    out += Session(userId, start.ts, last.ts, n, sum)
    out.result()
  }

  /** Batch sessionization: per-user gap-split sessions via mapGroups.
    * Groups arrive whole, so all sessions (including the last) emit. */
  def sessionizeBatch(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      toSessions(uid, it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)), gapMs).iterator
    }
  }

  // ---------------- event-chain transitions (q148's streaming twin)

  case class Transition(user_id: Long, from_ms: Long, from_type: String,
                        to_type: String)
  case class PendingEvent(ms: Long, id: Long, typ: String)
  /** Per-user chain state: the last FINALIZED event (the chain link to
    * the next one) plus the out-of-watermark tail still subject to
    * reordering. */
  case class ChainState(hasLast: Boolean, lastMs: Long, lastId: Long,
                        lastType: String, pending: Seq[PendingEvent])

  /** Batch twin of [[transitionsStream]]: per-user (ts, event_id)-
    * ordered adjacent event pairs — q148's transition stream before its
    * matrix rollup (one user-keyed shuffle; `lead` inside the per-user
    * sort). */
  def transitionsBatch(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.toDF()
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .select(col("user_id"), unix_millis(col("ts")).as("from_ms"),
        col("event_type").as("from_type"), col("to_type"))
      .as[Transition]
  }

  /** Watermark-ordered chain repair — the stateful streaming form of
    * "adjacent event pairs per user". Events newer than the watermark
    * BUFFER in state (they may still be reordered by late arrivals);
    * once the watermark passes them they finalize in (ts, event_id)
    * order and each adjacent pair emits one transition, chaining
    * across micro-batch boundaries through the retained last-finalized
    * event. In-watermark reordering and arbitrary batch splits
    * therefore cannot corrupt the chain: the emitted stream equals
    * [[transitionsBatch]] on the finalized prefix for ANY arrival
    * order the watermark admits (EventsStreamSpec pins this). Events
    * behind the watermark are dropped by the engine, same as every
    * stateful operator here.
    *
    * State per user is the last finalized event plus the
    * out-of-watermark tail — O(1) + O(late-horizon events), the same
    * bound sessionization carries. An event-time timer flushes the
    * tail when the watermark passes it without new arrivals. */
  def transitionsStream(events: Dataset[Event],
                        watermark: String = "1 hour"): Dataset[Transition] = {
    import events.sparkSession.implicits._

    def update(uid: Long, it: Iterator[Event],
               state: GroupState[ChainState]): Iterator[Transition] = {
      val wm = state.getCurrentWatermarkMs()
      val st = state.getOption.getOrElse(ChainState(false, 0L, 0L, "", Seq.empty))
      val all = (st.pending ++ it.map(e =>
          PendingEvent(e.ts.getTime, e.event_id, e.event_type)))
        .sortBy(p => (p.ms, p.id))
      val (fin, pend) = all.partition(_.ms <= wm)
      val out = Seq.newBuilder[Transition]
      var last = if (st.hasLast) Some(PendingEvent(st.lastMs, st.lastId, st.lastType)) else None
      fin.foreach { e =>
        last.foreach(p => out += Transition(uid, p.ms, p.typ, e.typ))
        last = Some(e)
      }
      state.update(ChainState(last.isDefined, last.map(_.ms).getOrElse(0L),
        last.map(_.id).getOrElse(0L), last.map(_.typ).getOrElse(""), pend))
      // flush the tail when the watermark passes it (min pending ms is
      // > wm by construction, as EventTimeTimeout requires)
      if (pend.nonEmpty) state.setTimeoutTimestamp(pend.map(_.ms).min)
      out.result().iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ------- trailing-window outlier flags (q200's streaming twin)

  case class OutlierFlag(user_id: Long, ms: Long, event_id: Long,
                         cents: Long, eval: Boolean, flag: Boolean)
  case class PendingCents(ms: Long, id: Long, cents: Long)
  /** Per-user outlier state: the ≤ 5 most recent FINALIZED cents
    * values (oldest first — the trailing baseline) plus the
    * out-of-watermark tail still subject to reordering. */
  case class OutlierState(window: Seq[Long], pending: Seq[PendingCents])

  /** q200's integer-exact trailing z-test — shared kernel: with n, S,
    * Q over the ≤5-value baseline window (cents), flag iff
    * `(n·x−S)² > 9·(n·Q−S²)`; evaluable iff n ≥ 3 and variance > 0.
    * Integer end-to-end — no division, no sqrt, so the streaming and
    * batch twins are bit-identical by construction. */
  private def outlierScore(window: Seq[Long], x: Long): (Boolean, Boolean) = {
    // BigInt throughout (ADVICE r10): cents ~1e9 give dev² ~2e19 >
    // Long.Max — a silent Long wrap would flip the flag identically in
    // both twins (bit-identical but wrong). n ≤ 5, so the cost is a
    // handful of small-object ops per event, not a hot loop.
    val n = BigInt(window.size)
    val s = window.foldLeft(BigInt(0))(_ + _)
    val q = window.foldLeft(BigInt(0))((a, c) => a + BigInt(c) * c)
    val dev = n * x - s
    val varn2 = n * q - s * s
    val eval = window.size >= 3 && varn2 > 0
    (eval, eval && dev * dev > varn2 * 9)
  }

  /** Batch twin of [[outliersStream]]: every event scored against its
    * user's 5 PREVIOUS events by (ts, event_id) — q200's monitor on
    * the events domain. One user-keyed shuffle; the trailing frame is
    * a bounded 5-row running state inside the window aggregation. */
  def outliersBatch(events: Dataset[Event]): Dataset[OutlierFlag] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var win = Seq.empty[Long]
      sorted.map { e =>
        val cents = math.round(e.value * 100)
        val (ev, fl) = outlierScore(win, cents)
        win = (win :+ cents).takeRight(5)
        OutlierFlag(uid, e.ts.getTime, e.event_id, cents, ev, fl)
      }.iterator
    }
  }

  /** Streaming trailing-window outlier monitor — the live form of the
    * q200/q218/q233 statistics wave (VERDICT r9 #6). Watermark-ordered
    * finalization (the [[transitionsStream]] discipline): events newer
    * than the watermark buffer in state; once the watermark passes
    * them they finalize in (ts, event_id) order, score against the ≤5
    * most recent FINALIZED values, and roll into the baseline window.
    * In-watermark reordering and arbitrary micro-batch splits cannot
    * change a single flag: the emitted stream equals [[outliersBatch]]
    * on the finalized prefix for ANY arrival order the watermark
    * admits (EventsStreamSpec pins this). State per user is 5 longs
    * plus the out-of-watermark tail — O(1) + O(late-horizon). */
  def outliersStream(events: Dataset[Event],
                     watermark: String = "1 hour"): Dataset[OutlierFlag] = {
    import events.sparkSession.implicits._

    def update(uid: Long, it: Iterator[Event],
               state: GroupState[OutlierState]): Iterator[OutlierFlag] = {
      val wm = state.getCurrentWatermarkMs()
      val st = state.getOption.getOrElse(OutlierState(Seq.empty, Seq.empty))
      val all = (st.pending ++ it.map(e =>
          PendingCents(e.ts.getTime, e.event_id, math.round(e.value * 100))))
        .sortBy(p => (p.ms, p.id))
      val (fin, pend) = all.partition(_.ms <= wm)
      var win = st.window
      val out = Seq.newBuilder[OutlierFlag]
      fin.foreach { e =>
        val (ev, fl) = outlierScore(win, e.cents)
        out += OutlierFlag(uid, e.ms, e.id, e.cents, ev, fl)
        win = (win :+ e.cents).takeRight(5)
      }
      state.update(OutlierState(win, pend))
      if (pend.nonEmpty) state.setTimeoutTimestamp(pend.map(_.ms).min)
      out.result().iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Open sessions carried between micro-batches, sorted by start. */
  case class OpenSessions(sessions: Seq[SessionState])

  private[graft] def asUnit(e: Event): SessionState =
    SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)

  /** Merge session intervals and new single-event units into
    * gap-maximal sessions. ORDER-INSENSITIVE: an arbitrarily late
    * (in-watermark) event extends a session backward, bridges two
    * sessions into one, or opens its own — exactly as the batch
    * sessionizer's global sort would have placed it. */
  private[graft] def mergeUnits(units: Seq[SessionState], gapMs: Long): Seq[SessionState] = {
    val sorted = units.sortBy(s => (s.startMs, s.lastMs))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    for (u <- sorted) {
      if (out.nonEmpty && u.startMs - out.last.lastMs <= gapMs) {
        val c = out.last
        out(out.length - 1) = SessionState(c.startMs,
          math.max(c.lastMs, u.lastMs), c.n + u.n, c.sum + u.sum)
      } else out += u
    }
    out.toSeq
  }

  private def toSession(uid: Long, s: SessionState): Session =
    Session(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)

  /** Streaming sessionization: flatMapGroupsWithState with event-time
    * timeout. State per user is the LIST of open sessions within the
    * watermark horizon (usually one; more when late events open or
    * extend earlier sessions). A session emits exactly when the
    * watermark passes its end + gap — never earlier, so a late
    * in-watermark event can still extend, bridge, or precede open
    * sessions with full batch parity. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30,
                       watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def update(uid: Long, it: Iterator[Event],
               state: GroupState[OpenSessions]): Iterator[Session] = {
      val wm = state.getCurrentWatermarkMs()
      val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      val merged = mergeUnits(existing ++ it.map(asUnit).toSeq, gapMs)
      // a session is final once no in-watermark event can extend it
      val (done, open) = merged.partition(s => s.lastMs + gapMs <= wm)
      if (open.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(OpenSessions(open))
        // single timeout per key: the earliest open session's close
        state.setTimeoutTimestamp(open.map(_.lastMs).min + gapMs)
      }
      done.iterator.map(toSession(uid, _))
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** The same sessionization on Spark 4's `transformWithState` API
    * (StatefulProcessor + typed ListState + explicit event-time
    * timers) — the forward path for custom streaming state:
    * fine-grained state types, multiple states per key, and timers
    * that are registered/deleted explicitly instead of the single
    * implicit GroupState timeout. Semantics identical to
    * [[sessionizeStream]] (open-session LIST, watermark-driven
    * emission); the spec pins both to the batch result. */
  private class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, Session] {

    @transient private var state: ListState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getListState[SessionState](
        "sessions", SqlEncoders.product[SessionState], TTLConfig.NONE)

    /** Shared by both handlers: merge, emit what the watermark closed,
      * store the rest, move the single live timer to the earliest open
      * close time. `firedTimer` is the auto-removed expiry when called
      * from the timer handler (so it must not be deleted again). */
    private def work(uid: Long, newEvents: Seq[Event], wm: Long,
                     firedTimer: Long): Iterator[Session] = {
      val existing = state.get().toSeq
      val prevTimer = if (existing.nonEmpty) existing.map(_.lastMs).min + gapMs else -1L
      val merged = mergeUnits(existing ++ newEvents.map(asUnit), gapMs)
      val (done, open) = merged.partition(s => s.lastMs + gapMs <= wm)
      state.clear()
      if (open.nonEmpty) {
        state.put(open.toArray)
        val newTimer = open.map(_.lastMs).min + gapMs
        if (prevTimer >= 0 && prevTimer != newTimer && prevTimer != firedTimer)
          getHandle.deleteTimer(prevTimer)
        if (newTimer != firedTimer) getHandle.registerTimer(newTimer)
      } else if (prevTimer >= 0 && prevTimer != firedTimer)
        getHandle.deleteTimer(prevTimer)
      done.iterator.map(toSession(uid, _))
    }

    override def handleInputRows(uid: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Session] =
      work(uid, rows.toSeq, tv.getCurrentWatermarkInMs(), firedTimer = -2L)

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] =
      work(uid, Seq.empty, tv.getCurrentWatermarkInMs(), info.getExpiryTimeInMs())
  }

  /** Streaming sessionization via transformWithState (see
    * [[SessionProcessor]]). Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`): the API stores each state
    * variable in its own column family, which the default HDFS-backed
    * store doesn't support. */
  def sessionizeStreamTws(events: Dataset[Event], gapMinutes: Int = 30,
                          watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
  // ------- daily-finalizing retrospective monitors (q218 / q233 twins)

  /** Per-type state for the daily retrospectives: `finalized` daily
    * (epochDay, count) history in day order — the whole-history
    * statistics need it (CUSUM's S_k and MAD's medians are functions
    * of EVERY day, unlike the ≤5-value outlier window) — plus partial
    * counts for days the watermark hasn't closed. State is one long
    * pair per day per type: bounded by the stream's day span, which a
    * production deployment caps by windowing the history (documented
    * trade; a year of state is 365 pairs). */
  case class DailyState(finalized: Seq[(Long, Long)], pending: Seq[(Long, Long)])

  private val DayMs = 86400000L

  /** Watermark-ordered day finalization shared by the q218/q233 twins
    * (the [[outliersStream]] discipline lifted from events to days):
    * pending per-day counts accumulate until the watermark passes the
    * day's last instant — at which point the watermark contract says
    * no event of that day can still arrive — then the day joins the
    * finalized history IN DAY ORDER and the retrospective kernel
    * re-emits over the grown prefix. In-watermark reordering and
    * arbitrary micro-batch splits cannot change any emission. */
  private def dailyRetroStream[T](events: Dataset[Event], watermark: String,
      emit: (String, Seq[(Long, Long)]) => T)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import events.sparkSession.implicits._

    def update(et: String, it: Iterator[Event],
               state: GroupState[DailyState]): Iterator[T] = {
      val wm = state.getCurrentWatermarkMs()
      val st = state.getOption.getOrElse(DailyState(Seq.empty, Seq.empty))
      val newCounts = it.map(e => Math.floorDiv(e.ts.getTime, DayMs)).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val pendMap = (st.pending ++ newCounts).groupBy(_._1)
        .map { case (d, xs) => (d, xs.map(_._2).sum) }.toSeq.sortBy(_._1)
      // day d spans [d·86400000, (d+1)·86400000): final once the
      // watermark reaches its last millisecond
      val (fin, pend) = pendMap.partition { case (d, _) => (d + 1) * DayMs - 1 <= wm }
      var hist = st.finalized
      val out = Seq.newBuilder[T]
      fin.foreach { case (d, c) => hist = hist :+ ((d, c)); out += emit(et, hist) }
      state.update(DailyState(hist, pend))
      // earliest pending day's close; > wm by construction of `pend`
      if (pend.nonEmpty) state.setTimeoutTimestamp((pend.map(_._1).min + 1) * DayMs - 1)
      out.result().iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Per-prefix batch twin runner: for each event type, the kernel's
    * retrospective after day 1, after day 2, … — exactly the emission
    * history the streaming twin produces once everything finalizes. */
  private def dailyRetroBatch[T](events: Dataset[Event],
      emit: (String, Seq[(Long, Long)]) => T)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type).flatMapGroups { (et, it) =>
      val hist = it.map(e => Math.floorDiv(e.ts.getTime, DayMs)).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      hist.indices.iterator.map(i => emit(et, hist.take(i + 1)))
    }
  }

  case class CusumPoint(event_type: String, n_days: Long, total_events: Long,
                        cusum_max: Long, changepoint_day: String)

  /** q218's CUSUM retrospective as a shared kernel over an in-order
    * daily history: argmax_k |n·cum_k − k·tot|, ties to the earliest
    * day — Long arithmetic matching the batch query and its oracle
    * bit for bit (q218's documented integer-clearing form; the same
    * n·cum magnitude bound applies). */
  private[graft] def cusumRetro(et: String, hist: Seq[(Long, Long)]): CusumPoint = {
    val n = hist.size.toLong
    val tot = hist.iterator.map(_._2).sum
    var cum = 0L; var k = 0L
    var best = -1L; var bestDay = 0L
    hist.foreach { case (day, c) =>
      cum += c; k += 1
      val s = math.abs(n * cum - k * tot)
      if (s > best) { best = s; bestDay = day } // strict > = earliest tie wins
    }
    CusumPoint(et, n, tot, best,
      java.time.LocalDate.ofEpochDay(bestDay).toString)
  }

  /** Live q218: one updated changepoint retrospective per type per
    * FINALIZED day. Equals [[cusumBatch]] on the finalized prefix for
    * any arrival order the watermark admits (EventsStreamSpec). */
  def cusumStream(events: Dataset[Event],
                  watermark: String = "1 hour"): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    dailyRetroStream(events, watermark, cusumRetro)
  }

  /** Batch twin of [[cusumStream]]: the full emission history; its
    * LAST row per type is q218's whole-history answer. */
  def cusumBatch(events: Dataset[Event]): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    dailyRetroBatch(events, cusumRetro)
  }

  case class MadCensus(event_type: String, n_days: Long, median_daily: Long,
                       mad: Long, n_outliers: Long, first_outlier_day: String,
                       outlier_mass: Long)

  /** q233's MAD census as a shared kernel: exact LOWER medians (the
    * `min v with 2·cumf ≥ n` gate = sorted((n−1)/2)), flag days with
    * |c − med| > 3·MAD; zero-MAD streams flag every deviating day —
    * q233's documented degenerate convention. */
  private[graft] def madRetro(et: String, hist: Seq[(Long, Long)]): MadCensus = {
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size - 1) / 2)
    }
    val med = lowerMedian(hist.map(_._2))
    val mad = lowerMedian(hist.map { case (_, c) => math.abs(c - med) })
    val outs = hist.filter { case (_, c) => math.abs(c - med) > mad * 3 }
    MadCensus(et, hist.size.toLong, med, mad, outs.size.toLong,
      outs.headOption.map(o => java.time.LocalDate.ofEpochDay(o._1).toString).orNull,
      outs.iterator.map(_._2).sum)
  }

  /** Live q233: one updated robust-outlier census per type per
    * finalized day — the monitor that cannot be poisoned by the
    * outlier it is judging (median/MAD, not mean/std). */
  def madOutliersStream(events: Dataset[Event],
                        watermark: String = "1 hour"): Dataset[MadCensus] = {
    import events.sparkSession.implicits._
    dailyRetroStream(events, watermark, madRetro)
  }

  /** Batch twin of [[madOutliersStream]] — last row per type is
    * q233's whole-history census. */
  def madOutliersBatch(events: Dataset[Event]): Dataset[MadCensus] = {
    import events.sparkSession.implicits._
    dailyRetroBatch(events, madRetro)
  }
}

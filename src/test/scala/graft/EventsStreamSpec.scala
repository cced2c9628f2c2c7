package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, Session}

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  // offset from epoch 0: the initial watermark is 0, and events with
  // ts <= watermark are filtered as late by stateful operators
  private val Base = 100020L // hour-aligned (divisible by 60) so windows land on round minutes
  private def mins(t: Timestamp): Long = t.getTime / 60000L - Base
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60000L)

  private def ev(id: Long, minutes: Long, uid: Long = 1L, typ: String = "click",
                 value: Double = 1.0): Event = Event(id, ts(minutes), uid, typ, value)

  test("streamingHourly: windows finalize when the watermark passes; late data dropped") {
    val mem = MemoryStream[Event]
    val out = EventsStream.streamingHourly(
      mem.toDF(), watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      // hour 0: two clicks; hour 1: one view
      mem.addData(ev(1, 10), ev(2, 20), ev(3, 70, typ = "view", value = 5.0))
      q.processAllAvailable()
      // watermark still at max(ts)-30m = 0:40 → nothing final yet
      spark.table("hourly").count() shouldBe 0
      // advance the watermark far past both windows
      mem.addData(ev(4, 600))
      q.processAllAvailable()
      // a late event behind the watermark must be dropped
      mem.addData(ev(5, 15, value = 99.0))
      mem.addData(ev(6, 1200)) // push watermark again so hour-10 finalizes
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("hour_start", "event_type", "n", "sum_value")
        .collect().map(r => (mins(r.getTimestamp(0)), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      rows should contain((0L, "click", 2L, 2.0))   // late ev5 NOT counted
      rows should contain((60L, "view", 1L, 5.0))
      rows should contain((600L, "click", 1L, 1.0))
    } finally q.stop()
  }

  test("streamingSliding: each event lands in size/slide windows; equals the batch twin") {
    val mem = MemoryStream[Event]
    val out = EventsStream.streamingSliding(mem.toDF(),
      size = "30 minutes", slide = "10 minutes", watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    try {
      val events = Seq(ev(1, 25), ev(2, 35, typ = "view", value = 3.0))
      mem.addData(events: _*)
      mem.addData(ev(3, 600)) // advance watermark past every early window
      q.processAllAvailable()
      val streamed = spark.table("sliding")
        .select("win_start", "event_type", "n", "sum_value")
        .collect().map(r => (mins(r.getTimestamp(0)), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      // minute-25 click → windows starting 0, 10, 20; minute-35 view → 10, 20, 30
      streamed should contain allOf(
        (0L, "click", 1L, 1.0), (10L, "click", 1L, 1.0), (20L, "click", 1L, 1.0),
        (10L, "view", 1L, 3.0), (30L, "view", 1L, 3.0))
      // batch twin on the same events produces the same finalized windows
      val batch = EventsStream.slidingByType(
          (events :+ ev(3, 600)).toDF(), "30 minutes", "10 minutes")
        .collect().map(r => (mins(r.getTimestamp(0)), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      streamed.subsetOf(batch) shouldBe true
    } finally q.stop()
  }

  test("sessionizeStream: gap-close on new event and timeout-close via watermark") {
    val mem = MemoryStream[Event]
    val out = EventsStream.sessionizeStream(mem.toDS(), gapMinutes = 30, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0,10,20 (one session), then 100 (new session after gap)
      mem.addData(ev(1, 0), ev(2, 10), ev(3, 20))
      q.processAllAvailable()
      mem.addData(ev(4, 100, value = 7.0))
      q.processAllAvailable()
      // the first session closed because ev4 arrived past the 30-min gap
      val afterGap = spark.table("sessions").as[Session].collect()
      afterGap.map(s => (mins(s.session_start), mins(s.session_end),
        s.n_events, s.sum_value)).toSet shouldBe Set((0L, 20L, 3L, 3.0))
      // push the watermark past 100+30min → the open session times out
      mem.addData(ev(5, 500, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(6, 600, uid = 2L)) // advance watermark once more to flush
      q.processAllAvailable()
      val all = spark.table("sessions").as[Session].collect()
        .map(s => (s.user_id, mins(s.session_start),
          mins(s.session_end), s.n_events)).toSet
      all should contain((1L, 0L, 20L, 3L))
      all should contain((1L, 100L, 100L, 1L))
    } finally q.stop()
  }

  test("sessionizeStream: late-but-in-watermark event cannot move a session's end backward") {
    val mem = MemoryStream[Event]
    // generous watermark so a minute-10 event is still on time after
    // the stream has seen minute 20
    val out = EventsStream.sessionizeStream(mem.toDS(), gapMinutes = 30, watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 0), ev(2, 20))
      q.processAllAvailable()
      mem.addData(ev(3, 10)) // late, within watermark, inside the open session
      q.processAllAvailable()
      // 45 is within the 30-min gap of the true session end (20) but
      // NOT of the late event (10) — a backward-moving lastMs would
      // wrongly split here
      mem.addData(ev(4, 45))
      q.processAllAvailable()
      // flush via timeout: push the watermark far past 45+30
      mem.addData(ev(5, 400, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(6, 500, uid = 2L))
      q.processAllAvailable()
      val u1 = spark.table("sessions_late").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (mins(s.session_start), mins(s.session_end), s.n_events)).toSet
      u1 shouldBe Set((0L, 45L, 4L))
    } finally q.stop()
  }

  test("sessionizeStream: late events extend the start backward or form their own session") {
    val mem = MemoryStream[Event]
    val out = EventsStream.sessionizeStream(mem.toDS(), gapMinutes = 30, watermark = "3 hours")
    val q = out.writeStream.format("memory").queryName("sessions_late2")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 120), ev(2, 140))
      q.processAllAvailable()
      // late, within gap of the open session's START (120-110=10 ≤ 30):
      // extends the session backward to 110
      mem.addData(ev(3, 110))
      q.processAllAvailable()
      // late, MORE than a gap before the session start (110-20=90 > 30):
      // must NOT pollute the open session — emitted as its own session
      mem.addData(ev(4, 20))
      q.processAllAvailable()
      // flush the open session via the watermark
      mem.addData(ev(5, 600, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(6, 700, uid = 2L))
      q.processAllAvailable()
      val u1 = spark.table("sessions_late2").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (mins(s.session_start), mins(s.session_end), s.n_events)).toSet
      u1 shouldBe Set((20L, 20L, 1L), (110L, 140L, 3L))
    } finally q.stop()
  }

  test("sessionizeStream: straggler late events merge with EACH OTHER like the batch twin") {
    val mem = MemoryStream[Event]
    val out = EventsStream.sessionizeStream(mem.toDS(), gapMinutes = 30, watermark = "5 hours")
    val q = out.writeStream.format("memory").queryName("sessions_late3")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 240), ev(2, 250))
      q.processAllAvailable()
      // two stragglers hours before the open session, 5 min apart:
      // they must form ONE session (20,25), not two singletons
      mem.addData(ev(3, 20))
      q.processAllAvailable()
      mem.addData(ev(4, 25))
      q.processAllAvailable()
      // and a bridging event that merges the open session with a new
      // one: 270 is within gap of 250 and of 290
      mem.addData(ev(5, 270), ev(6, 290))
      q.processAllAvailable()
      // flush everything via the watermark
      mem.addData(ev(7, 900, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(8, 990, uid = 2L))
      q.processAllAvailable()
      val u1 = spark.table("sessions_late3").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (mins(s.session_start), mins(s.session_end), s.n_events)).toSet
      u1 shouldBe Set((20L, 25L, 2L), (240L, 290L, 4L))
    } finally q.stop()
  }

  test("sessionizeStreamTws (transformWithState): same sessions as flatMapGroupsWithState") {
    // transformWithState needs a state store with column families —
    // RocksDB (ships in /opt/spark/jars), not the default HDFS-backed one
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val out = EventsStream.sessionizeStreamTws(mem.toDS(), gapMinutes = 30, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_tws")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 0), ev(2, 10), ev(3, 20))
      q.processAllAvailable()
      mem.addData(ev(4, 100, value = 7.0)) // past the gap → closes session 1
      q.processAllAvailable()
      val afterGap = spark.table("sessions_tws").as[Session].collect()
      afterGap.map(s => (mins(s.session_start), mins(s.session_end),
        s.n_events, s.sum_value)).toSet shouldBe Set((0L, 20L, 3L, 3.0))
      // advance the watermark far past 100+30min → the open session's
      // event-time timer fires and emits it
      mem.addData(ev(5, 500, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(6, 600, uid = 2L))
      q.processAllAvailable()
      val all = spark.table("sessions_tws").as[Session].collect()
        .map(s => (s.user_id, mins(s.session_start),
          mins(s.session_end), s.n_events)).toSet
      all should contain((1L, 0L, 20L, 3L))
      all should contain((1L, 100L, 100L, 1L))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("sessionizeStreamTws: straggler sessions emit one at a time as their timers fire") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val out = EventsStream.sessionizeStreamTws(mem.toDS(), gapMinutes = 30, watermark = "5 hours")
    val q = out.writeStream.format("memory").queryName("tws_straggler")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 240), ev(2, 250))
      q.processAllAvailable()
      // two stragglers → state now holds TWO open sessions (20,25) and
      // (240,250); the single live timer must track the EARLIEST
      mem.addData(ev(3, 20), ev(4, 25))
      q.processAllAvailable()
      // watermark to ~55+: closes only the early session, and the
      // timer must re-register for the later one
      mem.addData(ev(5, 360, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(6, 365, uid = 2L))
      q.processAllAvailable()
      val mid = spark.table("tws_straggler").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (mins(s.session_start), mins(s.session_end), s.n_events)).toSet
      mid shouldBe Set((20L, 25L, 2L))
      // push the watermark past 250+30 → the later session emits too
      mem.addData(ev(7, 900, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(8, 990, uid = 2L))
      q.processAllAvailable()
      val all = spark.table("tws_straggler").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (mins(s.session_start), mins(s.session_end), s.n_events)).toSet
      all shouldBe Set((20L, 25L, 2L), (240L, 250L, 2L))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("sessionizeStreamTws: a late in-watermark event in a LATER micro-batch " +
      "bridges two open sessions instead of splitting them (ADVICE r2 #1 replay)") {
    // The exact adjudication sequence: batch 1 delivers events at t=0
    // and t=50 (gap 30 → TWO provisional open sessions); batch 2
    // delivers t=25, late but inside the watermark, which bridges
    // them. The emitted result must be ONE session (0..50, 3 events) —
    // exactly what the batch twin computes on {0, 25, 50} — never the
    // split pair a lastMs-ordered merge would have produced.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val out = EventsStream.sessionizeStreamTws(mem.toDS(), gapMinutes = 30, watermark = "5 hours")
    val q = out.writeStream.format("memory").queryName("tws_bridge")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 0), ev(2, 50))
      q.processAllAvailable()
      mem.addData(ev(3, 25, value = 2.0)) // late, in-watermark, bridges 0 and 50
      q.processAllAvailable()
      // drive the watermark (5h) past 50+30 so the merged session closes
      mem.addData(ev(4, 400, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(5, 900, uid = 2L))
      q.processAllAvailable()
      val streamed = spark.table("tws_bridge").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (mins(s.session_start), mins(s.session_end), s.n_events, s.sum_value)).toSet
      val batch = EventsStream.sessionizeBatch(
          Seq(ev(1, 0), ev(2, 50), ev(3, 25, value = 2.0)).toDS(), gapMinutes = 30)
        .collect()
        .map(s => (mins(s.session_start), mins(s.session_end), s.n_events, s.sum_value)).toSet
      streamed shouldBe batch
      streamed shouldBe Set((0L, 50L, 3L, 4.0))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("enrichWithDim: stream-static broadcast join equals the batch twin, " +
      "unmatched keys survive with nulls") {
    import org.apache.spark.sql.functions.col
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val evs = Seq(ev(1, 0, uid = 1L), ev(2, 5, uid = 2L), ev(3, 9, uid = 99L))
    val mem = MemoryStream[Event]
    val out = EventsStream.enrichWithDim(mem.toDS().toDF(), dim)
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("event_id"), col("user_id"), col("tier"))
          .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      val streamed = rows(spark.table("enriched"))
      val batch = rows(EventsStream.enrichWithDim(evs.toDF(), dim))
      streamed shouldBe batch
      streamed should contain((3L, 99L, None)) // left join keeps dimension misses
    } finally q.stop()
  }

  test("sessionizeBatch: same gap semantics on a bounded Dataset") {
    val events = Seq(
      ev(1, 0), ev(2, 10), ev(3, 20),       // session 1 of user 1
      ev(4, 100, value = 7.0),              // session 2 of user 1
      ev(5, 5, uid = 2L), ev(6, 25, uid = 2L)) // one session for user 2
      .toDS()
    val s = EventsStream.sessionizeBatch(events, gapMinutes = 30)
      .collect().map(s => (s.user_id, mins(s.session_start),
        mins(s.session_end), s.n_events, s.sum_value)).toSet
    s shouldBe Set(
      (1L, 0L, 20L, 3L, 3.0),
      (1L, 100L, 100L, 1L, 7.0),
      (2L, 5L, 25L, 2L, 2.0))
  }

  test("batch/streaming transform parity: hourlyByType on the events fixture") {
    val batch = EventsStream.hourlyByType(Tables.events(spark, sf0001))
    // same transform, same numbers as q21's groupBy — spot-check totals
    val total = batch.agg(sum("n")).collect()(0).getLong(0)
    total shouldBe Tables.events(spark, sf0001).count()
  }

  test("readEventsStream: file-stream over the fixture dir reaches the same totals") {
    // the file-stream source needs a DIRECTORY; stage the fixture file
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = EventsStream.readEventsStream(spark, dir.toString)
    val q = EventsStream.hourlyByType(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("file_hourly").agg(sum("n")).collect()(0).getLong(0)
      streamed shouldBe Tables.events(spark, sf0001).count()
    } finally q.stop()
  }

  test("streamStreamPairs: watermarked stream-stream join equals the batch intervalJoin twin") {
    import graft.ops.RelationalOps
    // clicks at 0, 30; views at 5, 8, 25, 50 → pairs within ±10 min:
    // (c0,v5) (c0,v8) (c30,v25) — v50 is 20 min from c30, no pair
    val evs = Seq(
      ev(1, 0), ev(2, 30),
      ev(10, 5, typ = "view"), ev(11, 8, typ = "view"),
      ev(12, 25, typ = "view"), ev(13, 50, typ = "view"))
    val mem = MemoryStream[Event]
    val out = EventsStream.streamStreamPairs(mem.toDS().toDF(),
      withinMinutes = 10, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("ss_pairs")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // inner stream-stream join emits matches as both sides arrive —
      // no watermark flush needed for the matched pairs themselves
      val streamed = spark.table("ss_pairs")
        .select("user_id", "a_id", "b_id", "dt_ms").as[(Long, Long, Long, Long)]
        .collect().toSet
      val batchDf = evs.toDF()
      val a = batchDf.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      val b = batchDf.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      val batch = RelationalOps.intervalJoin(a, b, Seq("user_id"), "a_ts", "b_ts", 10 * 60000L)
        .select(col("user_id"), col("a_id"), col("b_id"),
          (unix_millis(col("b_ts")) - unix_millis(col("a_ts"))).as("dt_ms"))
        .as[(Long, Long, Long, Long)].collect().toSet
      streamed shouldBe batch
      streamed.map(t => (t._2, t._3)) shouldBe Set((1L, 10L), (1L, 11L), (2L, 12L))
    } finally q.stop()
  }

  test("streamStreamPairsLeftOuter: unmatched rows emit on watermark advance, equal batch twin") {
    // clicks at 0 (matches views 5, 8) and 30 (NO view within ±10);
    // the unmatched click-30 row must NOT emit until the watermark
    // passes 30+10=40 — pushed there by the minute-100 sentinel view
    val evs = Seq(
      ev(1, 0), ev(2, 30),
      ev(10, 5, typ = "view"), ev(11, 8, typ = "view"))
    val mem = MemoryStream[Event]
    val out = EventsStream.streamStreamPairsLeftOuter(mem.toDS().toDF(),
      withinMinutes = 10, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("ss_left")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val before = spark.table("ss_left")
        .select("a_id", "b_id").as[(Long, Option[Long])].collect().toSet
      // matches emit on arrival; the negative for click-2 is unproven
      // while a view could still arrive in its window
      before shouldBe Set((1L, Some(10L)), (1L, Some(11L)))

      // two subtleties the sentinels encode: (1) the watermark
      // computed at a batch's END applies to the NEXT batch, so
      // eviction needs a second batch after the advance; (2) the
      // GLOBAL watermark is the MIN across both sides' watermark
      // columns — a view-only sentinel leaves the click side at 0 and
      // nothing ever evicts, so sentinels arrive in matching
      // click+view pairs (which also keeps the batch twin identical)
      val s1 = Seq(ev(50, 100), ev(98, 100, typ = "view"))
      val s2 = Seq(ev(51, 140), ev(99, 140, typ = "view"))
      mem.addData(s1: _*)
      q.processAllAvailable()
      mem.addData(s2: _*)
      q.processAllAvailable()
      val after = spark.table("ss_left")
        .select("a_id", "b_id").as[(Long, Option[Long])].collect().toSet
      after shouldBe Set((1L, Some(10L)), (1L, Some(11L)), (2L, None),
        (50L, Some(98L)), (51L, Some(99L)))

      // and the flushed result equals the batch left interval join
      val all = evs ++ s1 ++ s2
      val batchDf = all.toDF()
      val a = batchDf.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      val b = batchDf.where(col("event_type") === "view")
        .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      val batch = a.join(b, col("user_id") === col("b_user") &&
          col("b_ts") >= col("a_ts") - expr("INTERVAL 10 MINUTES") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"), "leftOuter")
        .select(col("a_id"), col("b_id")).as[(Long, Option[Long])].collect().toSet
      after shouldBe batch
    } finally q.stop()
  }

  test("idempotentParquet sink: replayed batches land once, half-writes are replaced") {
    import graft.streaming.StreamSinks
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val sink = StreamSinks.idempotentParquet(dir)

    // end-to-end: stream → foreachBatch → partitioned parquet
    val mem = MemoryStream[Event]
    val q = mem.toDS().toDF().writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      mem.addData(ev(1, 0), ev(2, 10))
      q.processAllAvailable()
      mem.addData(ev(3, 20))
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(dir).select("event_id")
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L)

    // replay protection: re-invoking a committed batch id (what a
    // post-failure restart does) must not duplicate or clobber
    val replay = Seq(ev(99, 99)).toDF()
    val committedBatches = new java.io.File(dir).list().count(_.startsWith("batch="))
    sink(replay, 0L)
    spark.read.parquet(dir).select("event_id")
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L)

    // a half-written attempt (no _SUCCESS) IS replaced on replay
    val half = s"$dir/batch=${committedBatches}"
    new java.io.File(half).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$half/garbage"), "x")
    sink(replay, committedBatches.toLong)
    spark.read.parquet(dir).select("event_id")
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L, 99L)
  }

  test("aggStateSink: streaming MV maintenance equals the batch aggregate; replay-safe") {
    import graft.streaming.StreamSinks
    val dir = java.nio.file.Files.createTempDirectory("aggstate").toString
    val keys = Seq("user_id")
    val measures = Seq(("n", "sum"), ("sum_value", "sum"), ("max_value", "max"))
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(count(lit(1)).as("n"),
        sum("value").as("sum_value"), max("value").as("max_value"))
    val sink = StreamSinks.aggStateSink(dir, keys, measures)(partial)

    // end-to-end: three micro-batches through a real stream
    val mem = MemoryStream[Event]
    val q = mem.toDS().toDF().writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      mem.addData(ev(1, 0, uid = 1, value = 2.0), ev(2, 1, uid = 2, value = 3.0))
      q.processAllAvailable()
      mem.addData(ev(3, 2, uid = 1, value = 5.0))
      q.processAllAvailable()
      mem.addData(ev(4, 3, uid = 3, value = 1.0), ev(5, 4, uid = 1, value = 0.5))
      q.processAllAvailable()
    } finally q.stop()

    def stateMap() = StreamSinks.readAggState(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val afterStream = stateMap()
    afterStream shouldBe Map(
      1L -> ((3L, 7.5, 5.0)), 2L -> ((1L, 3.0, 3.0)), 3L -> ((1L, 1.0, 1.0)))

    // replay of an already-committed batch id must not double-count
    sink(Seq(ev(1, 0, uid = 1, value = 2.0), ev(2, 1, uid = 2, value = 3.0)).toDF(), 0L)
    stateMap() shouldBe afterStream

    // a NEW batch keeps merging on top of the latest committed state
    sink(Seq(ev(6, 5, uid = 2, value = 10.0)).toDF(), 3L)
    stateMap()(2L) shouldBe ((2L, 13.0, 10.0))

    // retention: only the newest keepVersions=2 state versions remain
    new java.io.File(dir).list().count(_.startsWith("v=")) shouldBe 2
  }

  test("dedupAppendSink: standing-corpus dedup on ingest, bloom-tiered, replay-safe") {
    import graft.streaming.StreamSinks
    val dir = java.nio.file.Files.createTempDirectory("dedup-append").toString
    val sink = StreamSinks.dedupAppendSink(dir, "event_id", expectedKeys = 10000L)

    val mem = MemoryStream[Event]
    val q = mem.toDS().toDF().writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      // batch 0: ids 1,2 (2 duplicated within the batch -> keepFirst)
      mem.addData(ev(1, 0, value = 1.0), ev(2, 1, value = 2.0), ev(2, 2, value = 99.0))
      q.processAllAvailable()
      // batch 1: id 2 again (already standing) + new 3
      mem.addData(ev(2, 3, value = 50.0), ev(3, 4, value = 3.0))
      q.processAllAvailable()
      // batch 2: all repeats -> appends nothing
      mem.addData(ev(1, 5), ev(3, 6))
      q.processAllAvailable()
    } finally q.stop()

    def appended() = spark.read.parquet(dir)
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val afterStream = appended()
    // each key exactly once, FIRST occurrence's payload kept
    afterStream shouldBe Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0)
    new java.io.File(dir, "_keys.bloom").exists() shouldBe true

    // replay of a committed batch id: no duplicate appends
    sink(Seq(ev(1, 0, value = 1.0), ev(2, 1, value = 2.0)).toDF(), 0L)
    appended() shouldBe afterStream

    // later batch: standing keys rejected, genuinely-new key lands
    sink(Seq(ev(2, 9, value = 77.0), ev(9, 9, value = 9.0)).toDF(), 7L)
    appended() shouldBe afterStream + (9L -> 9.0)

    // no false negatives: every standing key must still probe true
    val bloomBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_keys.bloom"))
    val bf = graft.functions.Bloom.read(bloomBytes)
    Seq(1L, 2L, 3L, 9L).foreach(k => bf.mightContainLong(k) shouldBe true)
  }

  test("streamingDedup: duplicated input collapses to distinct event_ids, state watermark-bounded") {
    // stage the fixture TWICE — every event arrives duplicated
    val dir = java.nio.file.Files.createTempDirectory("events-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("b.parquet"))
    val stream = EventsStream.readEventsStream(spark, dir.toString)
    val q = EventsStream.streamingDedup(stream)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val distinctIds = Tables.events(spark, sf0001)
        .select("event_id").distinct().count()
      spark.table("dedup_stream").count() shouldBe distinctIds
    } finally q.stop()
  }

  test("outliersStream: trailing z-flags equal the batch twin under shuffled in-watermark arrival") {
    import graft.streaming.EventsStream.OutlierFlag
    val mem = MemoryStream[Event]
    val out = EventsStream.outliersStream(mem.toDS(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("outliers")
      .outputMode("append").start()
    // user 1: a jittered baseline (10.00/11.00 alternating — nonzero
    // variance, so the window is evaluable) then a 500.00 spike at
    // event 6 and a mild 10.50 after it (masked by the contaminated
    // baseline — the documented trailing-window trade)
    val vals = Map(1L -> 10.0, 2L -> 11.0, 3L -> 10.0, 4L -> 11.0,
      5L -> 10.0, 6L -> 500.0, 7L -> 10.5)
    def e(id: Long) = ev(id, minutes = id * 5, value = vals(id))
    try {
      // arrival order scrambled WITHIN the watermark horizon, split
      // across micro-batches — finalization must repair the order
      mem.addData(e(3), e(1))
      q.processAllAvailable()
      mem.addData(e(2), e(5), e(4))
      q.processAllAvailable()
      mem.addData(e(7), e(6))
      q.processAllAvailable()
      mem.addData(ev(99, 2000, uid = 2L)) // wm → 1990: all of user 1 finalizes
      q.processAllAvailable()
      def key(f: OutlierFlag) = (f.user_id, f.ms, f.event_id, f.cents, f.eval, f.flag)
      val got = spark.table("outliers").as[OutlierFlag].collect().map(key).toSet
      val batch = EventsStream.outliersBatch(
          (1L to 7L).map(e).toDS()).collect().map(key).toSet
      got shouldBe batch
      // the spike — and ONLY the spike — flagged; events 1-3 were not
      // evaluable (window < 3); 7 is masked by the contaminated window
      got.filter(_._6).map(_._3) shouldBe Set(6L)
      got.filter(_._5).map(_._3) shouldBe Set(4L, 5L, 6L, 7L)
    } finally q.stop()
  }

  test("transitionsStream: watermark-ordered chain repair equals the batch twin; late data dropped") {
    import graft.streaming.EventsStream.Transition
    val mem = MemoryStream[Event]
    val out = EventsStream.transitionsStream(mem.toDS(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      def got(): Set[(Long, Long, String, String)] =
        spark.table("transitions").as[Transition].collect()
          .map(t => (t.user_id, t.from_ms / 60000L - Base, t.from_type, t.to_type)).toSet
      val expected = Set((1L, 0L, "click", "view"), (1L, 10L, "view", "purchase"),
        (2L, 600L, "click", "click"))
      // user 1's first two events arrive OUT OF ORDER in one batch;
      // the third lands in its own batch — the chain must repair the
      // order and link across batches
      mem.addData(ev(2, 10, typ = "view"), ev(1, 0, typ = "click"))
      q.processAllAvailable()
      mem.addData(ev(3, 20, typ = "purchase"))
      q.processAllAvailable()
      // intermediate emissions depend on exact watermark/timer timing;
      // what is INVARIANT is that nothing wrong is ever emitted
      assert(got().subsetOf(expected))
      // user 2's pair plus watermark pushers
      mem.addData(ev(4, 600, uid = 2L))
      q.processAllAvailable()
      mem.addData(ev(5, 1200, uid = 2L))
      q.processAllAvailable()
      assert(got().subsetOf(expected))
      mem.addData(ev(7, 2000, uid = 3L)) // wm → 1990: everything below finalizes
      q.processAllAvailable()
      // a behind-the-watermark event must be dropped, chains unaffected
      mem.addData(ev(6, 5, typ = "error"))
      q.processAllAvailable()
      got() shouldBe expected
      // equals the batch twin on the same events (uid 3's single event
      // pairs with nothing; every 'to' event is past the watermark)
      val batch = EventsStream.transitionsBatch(
          Seq(ev(1, 0, typ = "click"), ev(2, 10, typ = "view"),
            ev(3, 20, typ = "purchase"), ev(4, 600, uid = 2L),
            ev(5, 1200, uid = 2L), ev(7, 2000, uid = 3L)).toDS())
        .collect().map(t => (t.user_id, t.from_ms / 60000L - Base,
          t.from_type, t.to_type)).toSet
      got() shouldBe batch
    } finally q.stop()
  }
  test("outlierScore: cents beyond the Long-square range stay exact (ADVICE r10)") {
    // cents ~2e9 make dev^2 ~3.6e19 > Long.Max — a Long kernel wraps
    // negative and silently unflags a genuine 2x spike in both twins;
    // the BigInt kernel flags it. Window [2e9, 2e9+1, 2e9+2], x = 4e9:
    // varn2 is shift-invariant (= 6), dev = 6e9-3, flag must be true.
    val big = Seq(
      ev(1, 0, uid = 9L, value = 2e7),
      ev(2, 5, uid = 9L, value = 2e7 + 0.01),
      ev(3, 10, uid = 9L, value = 2e7 + 0.02),
      ev(4, 15, uid = 9L, value = 4e7)).toDS()
    val flags = EventsStream.outliersBatch(big).collect()
      .map(f => f.event_id -> (f.eval, f.flag)).toMap
    flags(4L) shouldBe ((true, true))
    // and the in-window points themselves never self-flag
    flags(1L)._2 shouldBe false
    flags(2L)._2 shouldBe false
    flags(3L)._2 shouldBe false
  }
  test("cusumStream + madOutliersStream: daily retrospectives equal the batch twins under watermark-ordered finalization") {
    import graft.streaming.EventsStream.{CusumPoint, MadCensus}
    // day helper: d = 0 is epochDay 70 (Base sits inside epochDay 69);
    // m = minutes into that day
    def dmin(d: Long, m: Long): Long = 780L + d * 1440L + m
    var id = 0L
    def e(d: Long, m: Long, typ: String): Event = { id += 1; ev(id, dmin(d, m), typ = typ) }
    // click daily counts [2, 3, 10, 1] over days 0..3; view [4, 4] over 0..1
    val b1 = Seq(e(0, 200, "click"), e(1, 30, "click"), e(0, 100, "click"),
      e(0, 80, "view"), e(0, 50, "view"), e(0, 70, "view"), e(0, 60, "view"))
    val b2 = Seq(e(1, 900, "click"), e(1, 500, "click"),
      e(1, 900, "view"), e(1, 600, "view"), e(1, 700, "view"), e(1, 800, "view"),
      e(2, 400, "click"))
    val b3 = (1 to 9).map(i => e(2, 400L + i * 50, "click")) :+ e(3, 100, "click")
    val pusher = e(5, 0, "zzz") // watermark push; its own day never finalizes
    val finalized = b1 ++ b2 ++ b3

    val memC = MemoryStream[Event]
    val qc = EventsStream.cusumStream(memC.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("cusum").outputMode("append").start()
    val memM = MemoryStream[Event]
    val qm = EventsStream.madOutliersStream(memM.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("madc").outputMode("append").start()
    try {
      for (b <- Seq(b1, b2, b3, Seq(pusher))) {
        memC.addData(b: _*); qc.processAllAvailable()
        memM.addData(b: _*); qm.processAllAvailable()
      }
      val gotC = spark.table("cusum").as[CusumPoint].collect().toSet
      val gotM = spark.table("madc").as[MadCensus].collect().toSet
      // equality with the per-prefix batch twins on the finalized events
      gotC shouldBe EventsStream.cusumBatch(finalized.toDS()).collect().toSet
      gotM shouldBe EventsStream.madOutliersBatch(finalized.toDS()).collect().toSet
      // hand-checked retrospectives: click [2,3,10,1] — the level shift
      // lands on day 1 via the earliest-tie rule (S = [8,12,12,0])
      gotC.filter(_.event_type == "click").map(_.n_days) shouldBe Set(1L, 2L, 3L, 4L)
      val c4 = gotC.find(p => p.event_type == "click" && p.n_days == 4).get
      c4 shouldBe CusumPoint("click", 4, 16, 12, "1970-03-13")
      val m4 = gotM.find(p => p.event_type == "click" && p.n_days == 4).get
      m4 shouldBe MadCensus("click", 4, 2, 1, 1, "1970-03-14", 10)
      // zero-MAD degenerate stream: constant view days flag nothing
      gotM.filter(_.event_type == "view").map(_.n_outliers) shouldBe Set(0L)
      // the pusher's own day is still pending: no zzz emission at all
      gotC.count(_.event_type == "zzz") shouldBe 0
    } finally { qc.stop(); qm.stop() }
  }

  test("q259 watermark advisor closed loop: a 5-minute-watermark stream loses EXACTLY " +
      "the rows the advisor's band census prices (VERDICT r11 #5)") {
    // 15 events, one micro-batch each, so the stream's watermark (max
    // event time − delay, updated per batch) tracks the advisor's
    // per-arrival high-water-mark model step for step. Lateness mix:
    // on-time, ≤1 min (band b), ≤5 min (band c, still inside the
    // watermark), 21 min (band d, dropped), 201/250 min (band e,
    // dropped). No event sits exactly ON the 5-minute boundary, so the
    // drop set is the same whichever side Spark's strict/inclusive
    // late-row predicate takes.
    val evs = Seq(
      ev(1, 0), ev(2, 10, typ = "view"), ev(3, 8), ev(4, 20, typ = "view"),
      ev(5, 16), ev(6, 30, typ = "view"), ev(7, 9), ev(8, 40, typ = "view"),
      ev(9, 39), ev(10, 300, typ = "view"), ev(11, 50), ev(12, 301, typ = "view"),
      ev(13, 299), ev(14, 100, typ = "view"), ev(15, 310))

    // ---- advisor side: q259 on the same 15 rows, via a planted fixture
    val dir = java.nio.file.Files.createTempDirectory("wm-advisor").toString
    evs.toDF().select(col("event_id"), col("event_type"), col("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val census = SparkEntry.queries("q259_watermark_advisor")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("band")) ->
        r.getAs[Long]("n")).toMap.withDefaultValue(0L)
    def advisorLost(typ: String): Long =
      census((typ, "d_1hour")) + census((typ, "e_beyond"))
    def advisorTotal(typ: String): Long =
      Seq("a_ontime", "b_1min", "c_5min", "d_1hour", "e_beyond")
        .map(b => census((typ, b))).sum
    // hand-checked: clicks lose ids 7 (21 min) and 11 (250 min); views
    // lose id 14 (201 min); bands ≤ 5 min (ids 3, 5, 9, 13) survive
    advisorLost("click") shouldBe 2L
    advisorLost("view") shouldBe 1L
    advisorTotal("click") shouldBe 8L
    advisorTotal("view") shouldBe 7L

    // ---- stream side: per-event micro-batches through streamingDedup
    // (row-grain lateness: unique event_ids mean every suppressed row
    // was suppressed by the watermark, not by deduplication)
    val mem = MemoryStream[Event]
    val out = EventsStream.streamingDedup(mem.toDF(), Seq("event_id"),
      watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("wmloop")
      .outputMode("append").start()
    try {
      evs.foreach { e => mem.addData(e); q.processAllAvailable() }
      val kept = spark.table("wmloop").groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val observedLost = Map(
        "click" -> (8L - kept("click")), "view" -> (7L - kept("view")))
      observedLost("click") shouldBe advisorLost("click")
      observedLost("view") shouldBe advisorLost("view")
      // the ppm the advisor prints is the ppm the stream actually loses
      def ppm(lost: Long, total: Long): Long = lost * 1000000L / total
      ppm(observedLost("click"), 8L) shouldBe ppm(advisorLost("click"), advisorTotal("click"))
      ppm(observedLost("view"), 7L) shouldBe ppm(advisorLost("view"), advisorTotal("view"))
    } finally q.stop()
  }
}

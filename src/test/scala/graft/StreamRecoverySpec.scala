package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{EventsStream, StreamSinks}
import graft.streaming.EventsStream.{Event, Session}

/** Streaming crash-recovery proof (VERDICT r4 item 4): a
  * `transformWithState` sessionization query over a FILE-stream source
  * with a durable checkpointLocation is stopped and restarted twice;
  * between run 1 and run 2 the last checkpoint commit marker is
  * deleted, simulating the classic crash window — the sink wrote batch
  * N (with `_SUCCESS`) but the query died before recording the commit.
  * The restart must REPLAY that data-carrying batch from its recorded
  * offsets, the idempotent sink must land it exactly once, and RocksDB
  * session state must survive both restarts (an open session extended
  * after the restart emits as ONE merged session).
  */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val Base = 100020L
  private def tstamp(minutes: Long) = new java.sql.Timestamp((Base + minutes) * 60000L)
  private def mins(t: java.sql.Timestamp): Long = t.getTime / 60000L - Base
  private def ev(id: Long, minutes: Long, uid: Long): Event =
    Event(id, tstamp(minutes), uid, "click", 1.0)

  /** Stage one parquet file of events with a controlled mtime so the
    * file source (maxFilesPerTrigger=1, oldest-first) sees our batch
    * boundaries deterministically. */
  private var stamp = 1700000000000L
  private def stage(dir: String, events: Event*): Unit = {
    val tmp = Files.createTempDirectory("stage").toString
    events.toDS().repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    stamp += 10000
    val dst = new File(dir, s"f$stamp.parquet")
    Files.move(part.toPath, dst.toPath)
    dst.setLastModified(stamp)
  }

  private def runOnce(srcDir: String, ckpt: String, outDir: String,
                      invoked: scala.collection.mutable.Buffer[Long]): Unit = {
    val src = spark.readStream
      .schema(Encoders.product[Event].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir).as[Event]
    val sessions = EventsStream.sessionizeStreamTws(src, gapMinutes = 30,
      watermark = "10 minutes")
    val sink = StreamSinks.idempotentParquet(outDir)
    val q = sessions.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        invoked += id; sink(df, id)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
  }

  test("kill + restart x2: RocksDB state survives, replayed batch lands exactly once") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = Files.createTempDirectory("recovery").toString
    val srcDir = s"$root/src"; val ckpt = s"$root/ckpt"; val outDir = s"$root/out"
    new File(srcDir).mkdirs()
    val invoked = scala.collection.mutable.Buffer.empty[Long]
    try {
      // ---- run 1: three single-file batches ---------------------------
      // b0: u1 session events + u9 singleton     (wm after: 10)
      // b1: u2@200 flusher                        (wm after: 190)
      // b2: u3@210 — processed AT wm=190, so u1 (0-20,+30<=190) and
      //     u9 (5,+30<=190) close and EMIT in this batch
      stage(srcDir, ev(1, 0, 1), ev(2, 10, 1), ev(3, 20, 1), ev(4, 5, 9))
      stage(srcDir, ev(5, 200, 2))
      stage(srcDir, ev(6, 210, 3))
      runOnce(srcDir, ckpt, outDir, invoked)

      val afterRun1 = spark.read.parquet(outDir).as[Session].collect()
        .map(s => (s.user_id, mins(s.session_start), mins(s.session_end), s.n_events)).toSet
      afterRun1 shouldBe Set((1L, 0L, 20L, 3L), (9L, 5L, 5L, 1L))
      // the emitting batch committed to the sink with a _SUCCESS marker
      // (every batch writes a dir — the emitting one is the one with rows)
      val emittingBatch = new File(outDir).listFiles()
        .filter(f => f.getName.startsWith("batch=") && new File(f, "_SUCCESS").exists())
        .filter(f => spark.read.parquet(f.toString).count() > 0)
      emittingBatch should have length 1
      val replayId = emittingBatch.head.getName.stripPrefix("batch=").toLong

      // ---- simulated crash: sink committed batch N, but the query died
      // before the checkpoint commit. At that instant offsets exist only
      // up to N and commits up to N-1 — so roll BACK everything past
      // that point (run 1's trailing watermark-only batch included):
      // commits >= N, offsets > N, and their .crc siblings.
      assert(Files.exists(Paths.get(s"$ckpt/commits/$replayId")))
      for (sub <- Seq("commits", "offsets"); f <- new File(s"$ckpt/$sub").listFiles()) {
        val id = f.getName.stripPrefix(".").stripSuffix(".crc")
        val keepBelow = if (sub == "commits") replayId else replayId + 1
        if (id.forall(_.isDigit) && id.toLong >= keepBelow) Files.delete(f.toPath)
      }

      // ---- run 2: must replay batch `replayId` (exactly-once via the
      // sink) AND extend u2's open session with state restored from the
      // checkpoint; then a far-future flusher closes u2+u3 -------------
      stage(srcDir, ev(7, 220, 2)) // 20 min after u2@200: merges iff state survived
      stage(srcDir, ev(8, 600, 4)) // flusher (wm -> 590 after its batch)
      stage(srcDir, ev(9, 700, 5)) // processed AT wm=590: closes u2, u3, u4
      invoked.clear()
      runOnce(srcDir, ckpt, outDir, invoked)
      invoked.head shouldBe replayId // the crash window batch really replayed

      val afterRun2 = spark.read.parquet(outDir).as[Session].collect()
        .map(s => (s.user_id, mins(s.session_start), mins(s.session_end), s.n_events))
      // exactly once: no tuple appears twice despite the replay
      afterRun2.length shouldBe afterRun2.toSet.size
      afterRun2.toSet shouldBe Set(
        (1L, 0L, 20L, 3L), (9L, 5L, 5L, 1L),
        (2L, 200L, 220L, 2L), // ONE merged session across the restart
        (3L, 210L, 210L, 1L), (4L, 600L, 600L, 1L))

      // ---- run 3: a second clean restart still resumes (u5 closes) ----
      stage(srcDir, ev(10, 1200, 6))
      stage(srcDir, ev(11, 1300, 7))
      runOnce(srcDir, ckpt, outDir, invoked)
      val afterRun3 = spark.read.parquet(outDir).as[Session].collect()
        .map(s => (s.user_id, mins(s.session_start), mins(s.session_end), s.n_events))
      afterRun3.length shouldBe afterRun3.toSet.size
      afterRun3.toSet should contain((5L, 700L, 700L, 1L))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}

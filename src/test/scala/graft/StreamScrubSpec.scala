package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.GramIndex
import graft.streaming.StreamSinks

/** Streaming span scrub ([[StreamSinks.spanScrubSink]]): arriving
  * shards scrubbed against the corpus-so-far with exactly-once
  * reports, pinned against the sequential probe-then-append batch
  * fold — which simultaneously pins the append-before-probe
  * commutation the sink's crash story relies on.
  */
class StreamScrubSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val w = (0 until 30).map(i => s"sw$i")
  private val spec = GramIndex.Spec(minLen = 8, buckets = 4)

  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

  private def scrubRows(d: DataFrame) =
    d.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq

  test("two shards stream against a standing corpus ≡ sequential batch fold; cross-shard dedup; exactly-once") {
    val corpus = df(Seq(
      100L -> w.mkString(" "),
      101L -> (0 until 12).map(i => s"cc$i").mkString(" ")))
    GramIndex.write(corpus, "stream_scrub", spec)
    GramIndex.write(corpus, "stream_scrub_twin", spec)
    val dir = java.nio.file.Files.createTempDirectory("stream-scrub").toString

    // shard 1: doc 300 fully corpus-backed (scrubs), doc 7 novel (kept)
    val b1 = Seq(300L -> w.take(12).mkString(" "),
      7L -> (0 until 9).map(i => s"pp$i").mkString(" "))
    // shard 2: doc 9 repeats SHARD 1's doc-7 template (cross-shard
    // dedup — only visible if batch 1's grams advanced the index),
    // doc 400 novel
    val b2 = Seq(9L -> (Seq("y0", "y1") ++ (0 until 9).map(i => s"pp$i")).mkString(" "),
      400L -> (0 until 10).map(i => s"zz$i").mkString(" "))

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamSinks.spanScrubSink("stream_scrub", spec, dir))
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // the batch twin: probe THEN append, per shard, on a second index
    val twin1 = scrubRows(GramIndex.scrubProbe(spark, df(b1), "stream_scrub_twin", spec))
    GramIndex.append(df(b1), "stream_scrub_twin", spec)
    val twin2 = scrubRows(GramIndex.scrubProbe(spark, df(b2), "stream_scrub_twin", spec))

    val out1 = scrubRows(spark.read.parquet(s"$dir/batch=0"))
    val out2 = scrubRows(spark.read.parquet(s"$dir/batch=1"))
    out1 shouldBe twin1
    out2 shouldBe twin2
    // fixture intent: 300 scrubbed by the standing corpus; 9 scrubbed
    // by SHARD 1's doc 7 (owner 7 < 9, cross-shard); 7 and 400 never
    // reported (novel templates, they own them)
    out1.map(_._1) shouldBe Seq(300L)
    out1.head._3 shouldBe 12L // all 12 tokens removed
    out2.map(_._1) shouldBe Seq(9L)
    (out2.head._2, out2.head._3) shouldBe ((11L, 9L)) // keeps "y0 y1"

    // exactly-once: replaying a COMMITTED batch drains and rewrites
    // nothing (marker mtime unchanged), and a spurious re-append of the
    // same shard cannot change a later probe (owners min-merge)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/batch=1/_SUCCESS")
    val mtime = fs.getFileStatus(marker).getModificationTime
    StreamSinks.spanScrubSink("stream_scrub", spec, dir)(df(b2), 1L)
    fs.getFileStatus(marker).getModificationTime shouldBe mtime
    GramIndex.append(df(b1), "stream_scrub", spec) // crash-replay double append
    scrubRows(GramIndex.scrubProbe(spark, df(b2), "stream_scrub", spec)) shouldBe out2
  }

  test("takedown SINK (VERDICT r15 #7): interleaved append/retract micro-batches ≡ sequential fold; replay idempotent") {
    val sspec = spec.copy(ownerSidecar = true)
    val cc = (0 until 12).map(i => s"cc$i")
    GramIndex.write(df(Seq(100L -> w.mkString(" "), 101L -> cc.mkString(" "))),
      "stream_td", sspec)
    val dir = java.nio.file.Files.createTempDirectory("stream-td").toString

    // the command stream: batch 0 appends doc 200 (same template as
    // 100); batch 1 retracts 100 AND appends 210 in ONE batch; batch 2
    // retracts 200 — after which template w has no holder left
    val b0 = Seq(("append", 200L, w.mkString(" ")))
    val b1 = Seq(("retract", 100L, w.mkString(" ")),
      ("append", 210L, cc.mkString(" ")))
    val b2 = Seq(("retract", 200L, w.mkString(" ")))
    val mem = MemoryStream[(String, Long, String)]
    val q = mem.toDF().toDF("op", "doc_id", "text")
      .writeStream.foreachBatch(StreamSinks.takedownSink("stream_td", sspec, dir))
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // ≡ the final state rebuilt directly: {101, 210} (both hold cc)
    GramIndex.write(df(Seq(101L -> cc.mkString(" "), 210L -> cc.mkString(" "))),
      "stream_td_ref", sspec)
    def stats(n: String) = GramIndex.sourceStats(spark, n)
      .orderBy("gram", "source").collect().map(_.toSeq).toSeq
    stats("stream_td") shouldBe stats("stream_td_ref")
    // probes agree: template w matches nothing (every holder retracted),
    // template cc still probes
    val wBatch = df(Seq(900L -> w.mkString(" ")))
    val ccBatch = df(Seq(901L -> cc.mkString(" ")))
    GramIndex.probe(spark, wBatch, "stream_td", sspec).count() shouldBe 0L
    GramIndex.probe(spark, ccBatch, "stream_td", sspec).count() shouldBe
      GramIndex.probe(spark, ccBatch, "stream_td_ref", sspec).count()
    // receipts observable per batch
    spark.read.parquet(s"$dir/batch=1").collect().head.toSeq shouldBe Seq(1L, 1L)

    // replay of a COMMITTED batch: drain only, marker untouched
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/batch=2/_SUCCESS")
    val mtime = fs.getFileStatus(marker).getModificationTime
    StreamSinks.takedownSink("stream_td", sspec, dir)(
      df(b2.map(t => (t._2, t._3))).toDF("doc_id", "text"), 2L)
    fs.getFileStatus(marker).getModificationTime shouldBe mtime
    // replay of an UNCOMMITTED batch (crash after the index fold,
    // before the receipt): the fold is a no-op — already-retracted ids
    // drop out — and the state still equals the rebuild
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batch=2"), true)
    StreamSinks.takedownSink("stream_td", sspec, dir)(
      Seq(("retract", 200L, w.mkString(" "))).toDF("op", "doc_id", "text"), 2L)
    stats("stream_td") shouldBe stats("stream_td_ref")
    GramIndex.probe(spark, wBatch, "stream_td", sspec).count() shouldBe 0L
    graft.ops.TrackedCache.release(spark)
  }

  test("retract BETWEEN streamed shards (VERDICT r14 #7): later batches scrub against the post-takedown corpus") {
    // the single-writer contract serializes the takedown with the
    // sink's appends (retract runs while the stream is idle between
    // micro-batches); what must hold is that every batch AFTER the
    // retract scrubs exactly as if the corpus never held the retracted
    // docs — owner re-derivation via the sidecar, mid-stream
    val sspec = spec.copy(ownerSidecar = true)
    val corpus = df(Seq(
      100L -> w.mkString(" "),                                  // template w
      101L -> (0 until 12).map(i => s"cc$i").mkString(" ")))    // template cc
    GramIndex.write(corpus, "stream_ret", sspec)
    GramIndex.write(df(Seq(101L -> (0 until 12).map(i => s"cc$i").mkString(" "))),
      "stream_ret_twin", sspec) // the post-takedown corpus, built directly
    val dir = java.nio.file.Files.createTempDirectory("stream-ret").toString

    val b1 = Seq(300L -> w.take(12).mkString(" "))  // scrubbed by doc 100
    val b2 = Seq(301L -> w.take(12).mkString(" "),  // after takedown of 100: KEPT
      302L -> (0 until 12).map(i => s"cc$i").mkString(" ")) // still scrubbed by 101

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamSinks.spanScrubSink("stream_ret", sspec, dir))
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      // takedown lands between micro-batches — doc 100 (template w's
      // only corpus holder AND its owner) leaves the index
      GramIndex.retract(df(Seq(100L -> w.mkString(" "))), "stream_ret", sspec)
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    scrubRows(spark.read.parquet(s"$dir/batch=0")).map(_._1) shouldBe Seq(300L)
    val out2 = scrubRows(spark.read.parquet(s"$dir/batch=1"))
    // 301 must NOT be scrubbed by the retracted doc 100 — but IS
    // scrubbed by batch 1's doc 300, which appended the same template
    // before the takedown (the union corpus still holds it via 300).
    // 302's template cc survives untouched. The twin proves it: the
    // post-takedown corpus + b1's append, probed with b2.
    GramIndex.append(df(b1), "stream_ret_twin", sspec)
    out2 shouldBe scrubRows(GramIndex.scrubProbe(spark, df(b2), "stream_ret_twin", sspec))
    out2.map(_._1).toSet shouldBe Set(301L, 302L) // 301 owned by 300 now, 302 by 101
    // and a takedown that ALSO removes the mid-stream holder frees the
    // template entirely: retract 300, then the same probe keeps 301
    GramIndex.retract(df(b1), "stream_ret", sspec)
    GramIndex.scrubProbe(spark, df(Seq(301L -> w.take(12).mkString(" "))),
        "stream_ret", sspec).count() shouldBe 0L
    graft.ops.TrackedCache.release(spark)
  }
}

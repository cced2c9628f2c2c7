package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.GramIndex
import graft.streaming.StreamSinks

/** Index-served leak attribution ([[GramIndex.attributeSources]] /
  * [[GramIndex.ownerAttribution]]) and its streaming monitoring form
  * ([[StreamSinks.leakAttributionSink]]): source-grain and owner-grain
  * answers pinned on a hand-computable fixture, multi-segment reads
  * pinned against the single-segment rebuild (the join-fold merge paths),
  * the breadth cap's count-not-drop honesty, and the streaming sink's
  * batch-twin equivalence + exactly-once replay.
  */
class LeakAttributionSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val ta = (0 until 12).map(i => s"la$i") // template A, 5 L=8 windows
  private val tb = (0 until 10).map(i => s"lb$i") // template B, 3 L=8 windows
  private val spec = GramIndex.Spec(minLen = 8, buckets = 4)

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  // corpus: source "ap" holds template A twice (docs 100, 104 — min
  // owner 100), source "rt" holds B once (doc 102)
  private val corpus = Seq(
    (100L, ta.mkString(" "), "ap"),
    (104L, ta.mkString(" "), "ap"),
    (102L, tb.mkString(" "), "rt"))

  // eval shard: 300 carries A then B (A's 5 windows + B's 3 match, the
  // 7 straddling windows are novel); 310 carries B only; 400 is novel;
  // 7 and 9 share a batch-internal template P (9 tokens → 2 windows)
  private val p = (0 until 9).map(i => s"lp$i")
  private val evalDocs = Seq(
    (300L, (ta ++ tb).mkString(" "), "evals"),
    (310L, tb.mkString(" "), "evals"),
    (400L, (0 until 10).map(i => s"lz$i").mkString(" "), "evals"),
    (7L, p.mkString(" "), "evals"),
    (9L, p.mkString(" "), "evals"))

  private def srcRows(d: DataFrame) =
    d.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private def ownRows(d: DataFrame) =
    d.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("attributeSources: hand-computed fixture; multi-segment ≡ rebuilt single segment") {
    GramIndex.write(df(corpus), "leak_src", spec)
    val got = srcRows(GramIndex.attributeSources(spark, df(evalDocs), "leak_src", spec))
    // 300: ap shares 5 windows, rt 3 → top ap; 8 matched, none wide
    // 310: rt 3; 7/9/400: no corpus match → absent (source grain reports
    // only docs with ≥1 INDEXED window; intra-batch dup is q297's job)
    got shouldBe Seq(
      (300L, Some("ap"), 5L, 8L, 0L),
      (310L, Some("rt"), 3L, 3L, 0L))

    // the same corpus written as base + two appends (A split across
    // segments: owners/stats must min/sum-merge through the join folds)
    GramIndex.write(df(corpus.take(1)), "leak_src_seg", spec)
    GramIndex.append(df(corpus.slice(1, 2)), "leak_src_seg", spec)
    GramIndex.append(df(corpus.drop(2)), "leak_src_seg", spec)
    srcRows(GramIndex.attributeSources(spark, df(evalDocs), "leak_src_seg", spec)) shouldBe got
    // and after a minor compaction (deltas folded, base untouched)
    GramIndex.compactDelta(spark, "leak_src_seg", spec)
    srcRows(GramIndex.attributeSources(spark, df(evalDocs), "leak_src_seg", spec)) shouldBe got
  }

  test("attributeSources breadth cap: over-cap grams counted, never attributed") {
    GramIndex.write(df(corpus), "leak_cap", spec)
    // A is held by 2 corpus docs, B by 1 → maxDocs = 1 excludes A
    val got = srcRows(GramIndex.attributeSources(
      spark, df(evalDocs), "leak_cap", spec, maxDocs = 1))
    got shouldBe Seq(
      (300L, Some("rt"), 3L, 8L, 5L),  // A's 5 windows counted as wide
      (310L, Some("rt"), 3L, 3L, 0L))
    // cap below every breadth: docs still reported, NULL source
    val all = srcRows(GramIndex.attributeSources(
      spark, df(evalDocs), "leak_cap", spec, maxDocs = 0))
    all shouldBe Seq(
      (300L, None, 0L, 8L, 8L),
      (310L, None, 0L, 3L, 3L))
  }

  test("ownerAttribution: corpus owners + intra-batch owners; multi-segment ≡ rebuild") {
    GramIndex.write(df(corpus), "leak_own", spec)
    val got = ownRows(GramIndex.ownerAttribution(spark, df(evalDocs), "leak_own", spec))
    // 300 → owner 100 (A, 5 windows) over 102 (B, 3); 310 → 102; 9 →
    // batch-internal owner 7 (2 windows); 7 owns P, 400 novel: absent
    got shouldBe Seq(
      (9L, 7L, 2L, 2L),
      (300L, 100L, 5L, 8L),
      (310L, 102L, 3L, 3L))
    GramIndex.write(df(corpus.take(1)), "leak_own_seg", spec)
    GramIndex.append(df(corpus.drop(1)), "leak_own_seg", spec)
    ownRows(GramIndex.ownerAttribution(spark, df(evalDocs), "leak_own_seg", spec)) shouldBe got
  }

  test("streaming sink: per-batch report ≡ batch twin; read-only; exactly-once replay") {
    GramIndex.write(df(corpus), "leak_stream", spec)
    val dir = java.nio.file.Files.createTempDirectory("leak-stream").toString
    val b1 = evalDocs.take(2) // 300, 310
    val b2 = evalDocs.drop(2) // 400 novel; 7 and 9 arrive with template P
    val mem = MemoryStream[(Long, String, String)]
    // ADVICE r14 #3: the sink must release ITS OWN tracked persists
    // inside each batch (a production stream has no harness release
    // between micro-batches) WITHOUT touching a concurrent caller's
    // frames — the sentinel below must survive the whole stream cached
    graft.ops.TrackedCache.release(spark)
    val sentinel = graft.ops.TrackedCache.persist(df(corpus))
    sentinel.count()
    val q = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch(StreamSinks.leakAttributionSink("leak_stream", spec, dir))
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // no per-batch registry/storage accumulation; the sentinel survives
    graft.ops.TrackedCache.pending(spark) shouldBe 1
    assert(sentinel.storageLevel.useMemory)

    val out1 = srcRows(spark.read.parquet(s"$dir/batch=0"))
    out1 shouldBe srcRows(GramIndex.attributeSources(spark, df(b1), "leak_stream", spec))
    out1.map(_._1) shouldBe Seq(300L, 310L)
    // batch 2's docs never touched the index (the sink is READ-ONLY —
    // eval docs must not enter the corpus): template P matches nothing,
    // even though two batch-2 docs share it, and a LATER probe of the
    // same docs still matches nothing
    spark.read.parquet(s"$dir/batch=1").count() shouldBe 0L
    GramIndex.attributeSources(spark, df(b2), "leak_stream", spec).count() shouldBe 0L

    // replay of a committed batch: drain only, marker untouched
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/batch=0/_SUCCESS")
    val mtime = fs.getFileStatus(marker).getModificationTime
    StreamSinks.leakAttributionSink("leak_stream", spec, dir)(df(b1), 0L)
    fs.getFileStatus(marker).getModificationTime shouldBe mtime
    graft.ops.TrackedCache.release(spark)
  }
}

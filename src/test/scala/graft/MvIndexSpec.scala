package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.MvIndex

/** Standing materialized view ([[MvIndex]]) — the MV member of the
  * standing-index family: per-group count/sum partials are an
  * INVERTIBLE monoid, so write/append/retract must equal a
  * from-scratch aggregate of the final state (fully-cancelled groups
  * vanish), replayed maintenance must be idempotent by digest naming,
  * roll-ups must fold from the partials without a fact scan, compact
  * must physically reclaim, and the crash windows (rename instant,
  * covered segments) must self-heal — the StatsIndex discipline,
  * verified on the MV algebra.
  */
class MvIndexSpec extends SparkSpec {
  import spark.implicits._

  // (grp, sub, x): two group keys incl. a NULL-keyed group, a measure
  // with exact decimal representations
  private val all: Seq[(Option[String], String, Double)] =
    (1 to 40).map { i =>
      (if (i % 13 == 0) None else Some(s"g${i % 3}"), s"s${i % 2}", i * 0.25)
    }
  private def df(rows: Seq[(Option[String], String, Double)]): DataFrame =
    rows.toDF("grp", "sub", "x")

  private val batchA = all.zipWithIndex.collect { case (r, i) if i % 3 != 2 => r }
  private val batchB = all.zipWithIndex.collect { case (r, i) if i % 3 == 2 => r }
  private val gone = all.zipWithIndex.collect { case (r, i) if i % 5 == 1 => r }
  private val kept = all.zipWithIndex.collect { case (r, i) if i % 5 != 1 => r }

  private def served(name: String) =
    MvIndex.serve(spark, name)
      .orderBy(col("grp").asc_nulls_first, col("sub"))
      .collect().map(_.toSeq).toSeq

  test("write+append+retract ≡ from-scratch aggregate of the final state; cancelled groups vanish") {
    MvIndex.write(df(batchA), "mvx_a", keys = Seq("grp", "sub"), measures = Seq("x"))
    MvIndex.append(df(batchB), "mvx_a")
    MvIndex.retract(df(gone), "mvx_a")
    MvIndex.write(df(kept), "mvx_ref", keys = Seq("grp", "sub"), measures = Seq("x"))
    served("mvx_a") shouldBe served("mvx_ref")
    // retract EVERYTHING that's left: the view must serve zero groups
    MvIndex.retract(df(kept), "mvx_a")
    MvIndex.serve(spark, "mvx_a").count() shouldBe 0L
  }

  test("replayed append/retract rewrite their segments; batchId separates identical batches; compact reclaims") {
    MvIndex.write(df(batchA), "mvx_i", keys = Seq("grp", "sub"), measures = Seq("x"))
    MvIndex.append(df(batchB), "mvx_i")
    MvIndex.retract(df(gone), "mvx_i")
    val want = served("mvx_i")
    // crash replays: same content → same digest → Overwrite, not add
    MvIndex.append(df(batchB), "mvx_i")
    MvIndex.retract(df(gone), "mvx_i")
    served("mvx_i") shouldBe want
    MvIndex.pendingSegments(spark, "mvx_i") shouldBe 2
    // two legitimately DISTINCT batches with identical content: the
    // batchId scopes the digest, so they count separately
    MvIndex.append(df(batchB), "mvx_i", batchId = "t1")
    MvIndex.append(df(batchB), "mvx_i", batchId = "t2")
    MvIndex.pendingSegments(spark, "mvx_i") shouldBe 4
    val n1 = MvIndex.serve(spark, "mvx_i")
      .agg(sum(col("n"))).collect()(0).getLong(0)
    n1 shouldBe (kept.size + 2 * batchB.size).toLong
    // ...and the same batchId replayed overwrites instead of doubling
    MvIndex.append(df(batchB), "mvx_i", batchId = "t2")
    MvIndex.serve(spark, "mvx_i")
      .agg(sum(col("n"))).collect()(0).getLong(0) shouldBe n1
    // bring the extra appends back out, then compact: segments gone,
    // serve unchanged
    MvIndex.retract(df(batchB), "mvx_i", batchId = "t1")
    MvIndex.retract(df(batchB), "mvx_i", batchId = "t2")
    MvIndex.compact(spark, "mvx_i")
    MvIndex.pendingSegments(spark, "mvx_i") shouldBe 0
    served("mvx_i") shouldBe want
    // the spec survives compaction
    MvIndex.spec(spark, "mvx_i") shouldBe ((Seq("grp", "sub"), Seq("x")))
  }

  test("roll-up answering folds from partials ≡ coarse from-scratch aggregate") {
    MvIndex.write(df(batchA), "mvx_r", keys = Seq("grp", "sub"), measures = Seq("x"))
    MvIndex.append(df(batchB), "mvx_r")
    MvIndex.retract(df(gone), "mvx_r")
    MvIndex.write(df(kept), "mvx_rc", keys = Seq("grp"), measures = Seq("x"))
    val got = MvIndex.serveRollup(spark, "mvx_r", Seq("grp"))
      .orderBy(col("grp").asc_nulls_first).collect().map(_.toSeq).toSeq
    val ref = MvIndex.serve(spark, "mvx_rc")
      .orderBy(col("grp").asc_nulls_first).collect().map(_.toSeq).toSeq
    got shouldBe ref
    // fail-loud on a key that isn't in the view
    val e = intercept[IllegalArgumentException] {
      MvIndex.serveRollup(spark, "mvx_r", Seq("nope"))
    }
    e.getMessage should include("not in view keys")
  }

  test("compact rename window self-heals; spec drift fails loudly") {
    MvIndex.write(df(kept), "mvx_h", keys = Seq("grp", "sub"), measures = Seq("x"))
    val want = served("mvx_h")
    // simulate a crash between compact's two renames: base is gone,
    // only _old survives — the next serve must heal and answer
    spark.sql("ALTER TABLE `mvx_h_mv` RENAME TO `mvx_h_mv_old`")
    served("mvx_h") shouldBe want
    // a batch missing a spec column is refused, never misfolded
    val e = intercept[IllegalArgumentException] {
      MvIndex.append(df(kept).drop("x"), "mvx_h")
    }
    e.getMessage should include("missing column")
  }

  test("streaming mvMaintenanceSink: op-tagged micro-batches ≡ batch fold; committed replay drains") {
    import graft.streaming.StreamSinks
    val receipts = java.nio.file.Files.createTempDirectory("mv-sink").toString
    MvIndex.write(df(batchA), "mvx_s", keys = Seq("grp", "sub"), measures = Seq("x"))
    val sink = StreamSinks.mvMaintenanceSink("mvx_s", receipts)
    val b0 = df(batchB).withColumn("op", lit("append"))
      .unionByName(df(gone).withColumn("op", lit("retract")))
    sink(b0, 0L)
    // mark batch 0 committed (foreachBatch receipt protocol), then
    // replay it: the fold must not move
    val want = served("mvx_s")
    want shouldBe served("mvx_ref") // same final state as the batch fold
    sink(b0, 0L)
    served("mvx_s") shouldBe want
    // a later batch with IDENTICAL content is a new stream batch id —
    // it must count (digest scoped by batch id, not content)
    sink(df(batchB).withColumn("op", lit("append")), 1L)
    MvIndex.serve(spark, "mvx_s").agg(sum(col("n")))
      .collect()(0).getLong(0) shouldBe (kept.size + batchB.size).toLong
  }

  test("catalog navigator: registered() discovers standing views; answer() picks the coarsest covering grain") {
    MvIndex.write(df(kept), "mvx_cat_fine", keys = Seq("grp", "sub"), measures = Seq("x"))
    MvIndex.write(df(kept), "mvx_cat_coarse", keys = Seq("grp"), measures = Seq("x"))
    val reg = MvIndex.registered(spark).toMap
    reg("mvx_cat_fine") shouldBe ((Seq("grp", "sub"), Seq("x")))
    reg("mvx_cat_coarse") shouldBe ((Seq("grp"), Seq("x")))
    val (chosen, rolled) = MvIndex.answer(spark, Seq("grp"), Seq("x"))
    // the shared-session catalog may hold other suites' views; the
    // CONTRACT is that the pick is a 1-key covering view and the
    // answer equals the from-scratch fold
    MvIndex.spec(spark, chosen)._1 shouldBe Seq("grp")
    rolled.orderBy(col("grp").asc_nulls_first).collect().map(_.toSeq).toSeq shouldBe
      MvIndex.serve(spark, "mvx_cat_coarse")
        .select(col("grp"), col("n"), col("sum_x"))
        .orderBy(col("grp").asc_nulls_first).collect().map(_.toSeq).toSeq
    // nothing covers a key no view carries — loud refusal
    val e = intercept[IllegalArgumentException] {
      MvIndex.answer(spark, Seq("no_such_key"), Seq("x"))
    }
    e.getMessage should include("covers")
  }

  test("composition: group-wise min/max under retraction via a group-keyed StatsIndex") {
    // The MvIndex scaladoc's claim, exercised: min/max are not
    // invertible, so the MV deliberately omits them — a StatsIndex
    // whose stat_key ENCODES the group serves them exactly under the
    // same lifecycle, from the value grain its algebra needs.
    import graft.ops.StatsIndex
    def melt(rows: Seq[(Option[String], String, Double)]) =
      df(rows).select(
        concat(lit("g:"), coalesce(col("grp"), lit("~null~"))).as("stat_key"),
        col("x").as("nv"), lit(null: String).as("sv"))
    StatsIndex.write(melt(batchA), "mvx_mm")
    StatsIndex.append(melt(batchB), "mvx_mm")
    StatsIndex.retract(melt(gone), "mvx_mm")
    StatsIndex.write(melt(kept), "mvx_mm_ref")
    def mm(n: String) = StatsIndex.columnStats(spark, n)
      .select(col("stat_key"), col("n"), col("min_num"), col("max_num"))
      .orderBy("stat_key").collect().map(_.toSeq).toSeq
    mm("mvx_mm") shouldBe mm("mvx_mm_ref")
    // and the counts agree with the MV itself (grp grain)
    MvIndex.write(df(kept), "mvx_mm_mv", keys = Seq("grp"), measures = Seq("x"))
    val nByGrp = MvIndex.serve(spark, "mvx_mm_mv")
      .select(concat(lit("g:"), coalesce(col("grp"), lit("~null~"))).as("stat_key"),
        col("n"))
      .orderBy("stat_key").collect().map(_.toSeq).toSeq
    mm("mvx_mm").map(r => Seq(r(0), r(1))) shouldBe nByGrp
  }

  test("a REAL stream through writeStream.foreachBatch maintains the view ≡ batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val receipts = java.nio.file.Files.createTempDirectory("mv-stream").toString
    MvIndex.write(df(batchA), "mvx_live", keys = Seq("grp", "sub"), measures = Seq("x"))
    val mem = MemoryStream[(String, Option[String], String, Double)]
    val q = mem.toDF().toDF("op", "grp", "sub", "x")
      .writeStream
      .foreachBatch(graft.streaming.StreamSinks.mvMaintenanceSink("mvx_live", receipts))
      .start()
    try {
      // micro-batch 0: the append leg; micro-batch 1: the retraction
      mem.addData(batchB.map { case (g, s2, x) => ("append", g, s2, x) }: _*)
      q.processAllAvailable()
      mem.addData(gone.map { case (g, s2, x) => ("retract", g, s2, x) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    served("mvx_live") shouldBe served("mvx_ref")
    // two receipts landed, one per micro-batch
    (0L to 1L).foreach { b =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$receipts/batch=$b/_SUCCESS")))
    }
  }
}

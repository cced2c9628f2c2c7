package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.StatsIndex

/** Incremental ANALYZE ([[StatsIndex]]) — the statistics member of the
  * standing-index family: per-value monoid maintenance must equal a
  * from-scratch pass of the FINAL state after any append/retract
  * sequence (including the non-invertible stats — min/max/NDV/HLL — and
  * the closed-form ntile histogram), with digest-named segments making
  * replayed maintenance idempotent and compact physically reclaiming.
  */
class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  // a value grain with ties, nulls, and a string column: ids 1..40,
  // v = id % 7 (ties straddle histogram buckets), s = parity label,
  // and two NULL rows exercising the null slots
  private def melt(rows: Seq[(Long, Option[Double], Option[String])]): DataFrame =
    rows.toDF("id", "v", "s").select(explode(array(
        struct(lit("col:id").as("stat_key"),
          col("id").cast("double").as("nv"), lit(null: String).as("sv")),
        struct(lit("col:v").as("stat_key"), col("v").as("nv"),
          lit(null: String).as("sv")),
        struct(lit("col:s").as("stat_key"),
          lit(null: java.lang.Double).as("nv"), col("s").as("sv")))).as("r"))
      .select(col("r.stat_key"), col("r.nv"), col("r.sv"))

  private val all: Seq[(Long, Option[Double], Option[String])] =
    (1L to 40L).map(i => (i, Some((i % 7).toDouble), Some(if (i % 2 == 0) "even" else "odd"))) :+
      (41L, None, Some("odd")) :+ (42L, Some(3.0), None)
  private val batchA = all.filter(_._1 % 3 != 2)
  private val batchB = all.filter(_._1 % 3 == 2)
  private val gone = all.filter(_._1 % 5 == 1)
  private val kept = all.filterNot(_._1 % 5 == 1)

  private def served(name: String) =
    (StatsIndex.columnStats(spark, name) unionByName
      StatsIndex.histogram(spark, name, "v", nBuckets = 4))
      .orderBy("stat_key").collect().map(_.toSeq).toSeq

  test("write+append+retract ≡ from-scratch ANALYZE of the final state (scalars + histogram)") {
    StatsIndex.write(melt(batchA), "stx_a")
    StatsIndex.append(melt(batchB), "stx_a")
    StatsIndex.retract(melt(gone), "stx_a")
    StatsIndex.write(melt(kept), "stx_ref")
    val got = served("stx_a")
    got shouldBe served("stx_ref")
    // sanity against hand-derivable facts of the final state
    val byKey = got.map(r => r.head.toString -> r).toMap
    byKey("col:id")(1) shouldBe kept.size.toLong            // n
    byKey("col:id")(3) shouldBe kept.size.toLong            // ndv (ids unique)
    byKey("col:v")(2) shouldBe kept.count(_._2.isEmpty).toLong // n_null
    // histogram buckets cover all rows exactly once
    val histN = got.filter(_.head.toString.startsWith("hist:v:")).map(_(1).asInstanceOf[Long]).sum
    histN shouldBe kept.count(_._2.nonEmpty).toLong + kept.count(_._2.isEmpty).toLong
  }

  test("replayed append/retract rewrite their digest segments — no double-count; compact reclaims") {
    StatsIndex.write(melt(batchA), "stx_i")
    StatsIndex.append(melt(batchB), "stx_i")
    StatsIndex.retract(melt(gone), "stx_i")
    val want = served("stx_i")
    // crash replays: same content → same digest → Overwrite, not append
    StatsIndex.append(melt(batchB), "stx_i")
    StatsIndex.retract(melt(gone), "stx_i")
    served("stx_i") shouldBe want
    def nSegs = spark.sessionState.catalog
      .listTables("default", "stx_i_vals_*").map(_.table)
      .count(_.matches("stx_i_vals_[dr][0-9a-f]+"))
    nSegs shouldBe 2
    // compact: segments folded away, net-zero values physically gone,
    // serve unchanged
    StatsIndex.compact(spark, "stx_i")
    nSegs shouldBe 0
    served("stx_i") shouldBe want
    // a fully-retracted value leaves no row in the base at all
    val goneOnlyIds = gone.map(_._1.toDouble).toSet -- kept.map(_._1.toDouble)
    spark.table("stx_i_vals")
      .where(col("stat_key") === "col:id" &&
        col("nv").isin(goneOnlyIds.toSeq: _*)).count() shouldBe 0L
  }

  test("compact crash windows: heal recovers the rename gap; covered segments never double-count (ADVICE r15 #1/#5)") {
    StatsIndex.write(melt(batchA), "stx_w")
    StatsIndex.append(melt(batchB), "stx_w")
    val want = served("stx_w")
    // the no-live-base instant between compact's two renames: a reader
    // landing there must heal from the surviving copy, not throw
    spark.sql("ALTER TABLE stx_w_vals RENAME TO stx_w_vals_old")
    served("stx_w") shouldBe want
    spark.catalog.tableExists("stx_w_vals") shouldBe true // healed back
    // post-swap crash: the folded segment still stands while the base
    // already contains it — recreate it from the covers stamp and
    // assert it does NOT double-count (covered garbage, filtered)
    StatsIndex.compact(spark, "stx_w")
    val covered = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("stx_w_vals"))
      .properties("graft.coversSegs").split(",").filter(_.nonEmpty).head
    spark.table("stx_w_vals").limit(5)
      .write.saveAsTable(s"stx_w_vals_$covered")
    served("stx_w") shouldBe want
    // the next maintenance write sweeps the garbage and clears the stamp
    StatsIndex.append(melt(Seq((99L, Some(1.0), Some("odd")))), "stx_w")
    spark.catalog.tableExists(s"stx_w_vals_$covered") shouldBe false
    StatsIndex.write(melt(all :+ ((99L, Option(1.0), Option("odd")))), "stx_w_ref")
    served("stx_w") shouldBe served("stx_w_ref")
  }

  test("distinct same-content batches need batchIds; same batchId replays overwrite (ADVICE r15 #4)") {
    // two legitimately distinct batches with IDENTICAL melted content —
    // per-content digests would silently coalesce them
    StatsIndex.write(melt(batchA), "stx_b")
    StatsIndex.append(melt(batchB), "stx_b", batchId = "b1")
    StatsIndex.append(melt(batchB), "stx_b", batchId = "b2")
    StatsIndex.write(melt(batchA ++ batchB ++ batchB), "stx_b_ref")
    served("stx_b") shouldBe served("stx_b_ref")
    // a crash-replay carries the same batchId: idempotent overwrite
    StatsIndex.append(melt(batchB), "stx_b", batchId = "b2")
    served("stx_b") shouldBe served("stx_b_ref")
    // retraction takes the same scoping
    StatsIndex.retract(melt(batchB), "stx_b", batchId = "b1")
    StatsIndex.retract(melt(batchB), "stx_b", batchId = "b1") // replay
    StatsIndex.write(melt(batchA ++ batchB), "stx_b_ref2")
    served("stx_b") shouldBe served("stx_b_ref2")
  }

  test("streaming maintenance SINK: op-tagged melted micro-batches ≡ from-scratch; stream batch ids scope exactly-once") {
    import graft.streaming.StreamSinks
    val tmp = java.nio.file.Files.createTempDirectory("graft-stsink").toString
    StatsIndex.write(melt(batchA), "stx_s")
    val sink = StreamSinks.statsMaintenanceSink("stx_s", s"$tmp/rcpt")
    // batch 0: appends (op-less frame defaults to all-append);
    // batch 1: a MIXED micro-batch carrying appends and retractions
    val extra: Seq[(Long, Option[Double], Option[String])] =
      Seq((50L, Some(2.0), Some("even")))
    sink(melt(batchB), 0L)
    sink(melt(gone).withColumn("op", lit("retract")) unionByName
      melt(extra).withColumn("op", lit("append")), 1L)
    StatsIndex.write(melt(kept ++ extra), "stx_s_ref")
    served("stx_s") shouldBe served("stx_s_ref")
    // receipts: one _SUCCESS-gated row per batch with op counts
    val r1 = spark.read.parquet(s"$tmp/rcpt/batch=1").collect().head
    r1.getLong(0) shouldBe melt(extra).count()
    r1.getLong(1) shouldBe melt(gone).count()
    // committed replay: drain only (receipt mtime pinned)
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$tmp/rcpt/batch=0/_SUCCESS")
    val mtime = fs.getFileStatus(marker).getModificationTime
    sink(melt(batchB), 0L)
    fs.getFileStatus(marker).getModificationTime shouldBe mtime
    served("stx_s") shouldBe served("stx_s_ref")
    // UNCOMMITTED replay (crash after the fold, before the receipt):
    // recompute rewrites the same digest(content, batchId) segments
    // bit-identically — no double-count
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/rcpt/batch=0"), true)
    sink(melt(batchB), 0L)
    served("stx_s") shouldBe served("stx_s_ref")
    // two DISTINCT stream batches with identical content count twice —
    // the stream batch id is the disambiguator (ADVICE r15 #4 closed
    // for the streaming caller by construction)
    sink(melt(batchB), 7L)
    StatsIndex.write(melt(kept ++ extra ++ batchB), "stx_s_ref2")
    served("stx_s") shouldBe served("stx_s_ref2")
  }

  test("sketch tier: high-NDV columns store O(1) rows per batch, serve estimates, refuse retraction (VERDICT r15 #6)") {
    StatsIndex.write(melt(batchA), "stx_t", sketch = Set("col:id"))
    StatsIndex.append(melt(batchB), "stx_t")
    // _vals growth ∝ low-NDV columns only: col:id contributes its 7
    // fixed sketch rows per segment, never one row per distinct id
    spark.table("stx_t_vals")
      .where(col("stat_key") === "col:id").count() shouldBe 0L
    spark.table("stx_t_vals")
      .where(col("stat_key").endsWith(":col:id")).count() shouldBe 7L
    // the exact tier is untouched by the split: col:v / col:s match the
    // untiered reference bit-for-bit, and col:id never appears there
    StatsIndex.write(melt(batchA ++ batchB), "stx_t_ref")
    def exactRows(n: String) = StatsIndex.columnStats(spark, n)
      .where(col("stat_key") =!= "col:id")
      .orderBy("stat_key").collect().map(_.toSeq).toSeq
    exactRows("stx_t") shouldBe exactRows("stx_t_ref")
    StatsIndex.columnStats(spark, "stx_t")
      .where(col("stat_key") === "col:id").count() shouldBe 0L
    // sketch serve: exact n / n_null / min / max, HLL ndv estimate
    def sk() = StatsIndex.sketchStats(spark, "stx_t").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    val Seq(row) = sk()
    row._1 shouldBe "col:id"
    row._2 shouldBe all.size.toLong // n
    row._3 shouldBe 0L              // ids are never null
    row._4.toDouble shouldBe (all.size.toDouble +- all.size * 0.15) // ndv_est
    row._5 shouldBe 1.0
    row._6 shouldBe 42.0
    // retraction refuses loudly when the batch names a sketch key...
    val e = intercept[IllegalArgumentException](
      StatsIndex.retract(melt(gone), "stx_t"))
    e.getMessage should include("SKETCH-tier")
    // ...but exact-tier keys remain retractable next to the tier
    StatsIndex.retract(melt(gone).where(col("stat_key") =!= "col:id"), "stx_t")
    StatsIndex.write(melt(kept), "stx_t_ref2")
    exactRows("stx_t") shouldBe exactRows("stx_t_ref2")
    // compact folds both tiers (sketch families collapse to single
    // rows, sketches union) and keeps the tier stamp
    val want = (exactRows("stx_t"), sk())
    StatsIndex.compact(spark, "stx_t")
    (exactRows("stx_t"), sk()) shouldBe want
    spark.table("stx_t_vals")
      .where(col("stat_key").endsWith(":col:id")).count() shouldBe 7L
    StatsIndex.sketchKeys(spark, "stx_t") shouldBe Set("col:id")
  }

  test("advisor serve: index-derived histograms AND exact join count ≡ from-scratch (VERDICT r15 #5)") {
    // two keyed sides with skew and a retraction on side A — the q304
    // shape in miniature. The index serves (a) the equi-width bucket
    // histograms and (b) the EXACT equi-join cardinality, both from
    // the per-value frames alone; the reference computes them from the
    // raw rows of the final state.
    val aRows = (1L to 60L).map(k => (k, Some(k.toDouble), None: Option[String])) ++
      (1L to 20L).map(k => (k, Some(k.toDouble), None: Option[String]))
    val gone2 = aRows.filter(_._1 % 4 == 0)
    val bRows = (30L to 90L).map(k => (k, Some(k.toDouble), None: Option[String])) ++
      (30L to 40L).map(k => (k, Some(k.toDouble), None: Option[String]))
    def meltK(rows: Seq[(Long, Option[Double], Option[String])]) =
      rows.toDF("id", "v", "s").select(lit("col:k").as("stat_key"),
        col("v").as("nv"), lit(null: String).as("sv"))
    StatsIndex.write(meltK(aRows.filter(_._1 % 2 == 0)), "stx_adv_a")
    StatsIndex.append(meltK(aRows.filter(_._1 % 2 == 1)), "stx_adv_a")
    StatsIndex.retract(meltK(gone2), "stx_adv_a")
    StatsIndex.write(meltK(bRows), "stx_adv_b")
    val av = StatsIndex.liveValues(spark, "stx_adv_a")
      .select(col("nv").cast("long").as("k"), col("cnt").as("ac"))
    val bv = StatsIndex.liveValues(spark, "stx_adv_b")
      .select(col("nv").cast("long").as("k"), col("cnt").as("bc"))
    // exact join cardinality from the per-value monoid alone
    val served = av.join(bv, Seq("k"))
      .agg(coalesce(sum(col("ac") * col("bc")), lit(0L))).collect()(0).getLong(0)
    val aFinal = aRows.filterNot(gone2.contains).map(_._1)
    val bFinal = bRows.map(_._1)
    val exact = aFinal.map(k => bFinal.count(_ == k).toLong).sum
    served shouldBe exact
    // equi-width histogram (the q269/q304 arithmetic) from the index ≡
    // from the raw rows
    val lo = aFinal.min; val hi = aFinal.max; val b = 8L
    val width = (hi - lo + b) / b
    def histServed = av.where(col("k").between(lo, hi))
      .groupBy(expr(s"(k - $lo) div $width").as("bucket"))
      .agg(sum(col("ac")).cast("long").as("n"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val histRaw = aFinal.groupBy(k => (k - lo) / width).view
      .mapValues(_.size.toLong).toSeq.sorted
    histServed shouldBe histRaw
    // staleness stamp: two pending segments on A (append + retract), none on B
    StatsIndex.pendingSegments(spark, "stx_adv_a") shouldBe 2
    StatsIndex.pendingSegments(spark, "stx_adv_b") shouldBe 0
    StatsIndex.compact(spark, "stx_adv_a")
    StatsIndex.pendingSegments(spark, "stx_adv_a") shouldBe 0
  }

  test("StatsCbo: the index-derived pick lands in the physical plan and flips with the threshold (VERDICT r15 #10)") {
    import graft.ops.StatsCbo
    // fact side 1000 rows (exact tier), dim side 20 rows maintained in
    // the SKETCH tier — the decision must price even a high-NDV key
    // column without a value grain
    val fact = (1L to 1000L).map(k => (k % 20 + 1, s"p$k")).toDF("k", "payload")
    val dim = (1L to 20L).map(k => (k, s"d$k")).toDF("k", "label")
    StatsIndex.write(fact.select(lit("col:k").as("stat_key"),
      col("k").cast("double").as("nv"), lit(null: String).as("sv")), "stx_cbo_a")
    StatsIndex.write(dim.select(lit("col:k").as("stat_key"),
      col("k").cast("double").as("nv"), lit(null: String).as("sv")), "stx_cbo_b",
      sketch = Set("col:k"))
    val a = StatsCbo.sideStats(spark, "stx_cbo_a", "col:k", 32L)
    val b = StatsCbo.sideStats(spark, "stx_cbo_b", "col:k", 32L)
    a.rows shouldBe 1000L
    b.rows shouldBe 20L // served from the sketch tier's n row
    // isolate the HINT: Spark's own auto-broadcast would broadcast a
    // 20-row side regardless, hiding whether the decision did anything
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val pick = StatsCbo.Decision(a, b)
      pick.broadcastB shouldBe true
      val planB = StatsCbo.join(fact, dim, Seq("k"), pick)
        .queryExecution.executedPlan.toString
      planB should include("BroadcastHashJoin")
      // a threshold below both sides: no hint, the join shuffles
      val none = StatsCbo.Decision(a, b, thresholdBytes = 1L)
      none.broadcastA shouldBe false
      none.broadcastB shouldBe false
      val planS = StatsCbo.join(fact, dim, Seq("k"), none)
        .queryExecution.executedPlan.toString
      (planS should not).include("BroadcastHashJoin")
      // content is strategy-invariant
      StatsCbo.join(fact, dim, Seq("k"), pick).count() shouldBe
        StatsCbo.join(fact, dim, Seq("k"), none).count()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("histogram straddling: a value spanning bucket boundaries splits its row count exactly") {
    // one value with 10 rows, another with 2, nBuckets = 4 → the heavy
    // value must straddle several buckets with exact per-bucket counts
    val rows = (1L to 10L).map(i => (i, Some(1.0), Some("x"))) ++
      Seq((11L, Some(2.0), Some("x")), (12L, Some(2.0), Some("x"))).map(t => (t._1, t._2, t._3))
    StatsIndex.write(melt(rows), "stx_h")
    val hist = StatsIndex.histogram(spark, "stx_h", "v", nBuckets = 4)
      .orderBy("stat_key").collect()
    hist.map(_.getLong(1)).sum shouldBe 12L
    hist.map(_.getLong(1)).toSeq shouldBe Seq(3L, 3L, 3L, 3L) // 12 rows / 4 buckets
    // buckets 1-3 hold only value 1.0; bucket 4 holds 1.0 (1 row) + 2.0 (2 rows)
    hist.map(_.getLong(3)).toSeq shouldBe Seq(1L, 1L, 1L, 2L) // ndv per bucket
    hist.last.getDouble(5) shouldBe 1.0 // min_num of the straddled bucket
    hist.last.getDouble(6) shouldBe 2.0
  }
}

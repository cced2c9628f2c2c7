package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, GramIndex}

/** Standing gram-index lifecycle: probe ≡ the DataFrame-to-DataFrame
  * recompute, append ≡ rebuild, compact preserves results, and the
  * probe plan reads the index bucketed with no corpus-side exchange.
  */
class GramIndexSpec extends SparkSpec {
  import spark.implicits._

  private val w = (0 until 30).map(i => s"gw$i")
  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val corpus = docsDF(
    100L -> w.mkString(" "),
    101L -> (0 until 12).map(i => s"c$i").mkString(" "))
  private val batch = docsDF(
    1L -> ((0 until 4).map(i => s"b$i") ++ w.take(10)).mkString(" "),
    2L -> (0 until 15).map(i => s"z$i").mkString(" "))
  private val spec = GramIndex.Spec(minLen = 8, buckets = 4)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("probe equals dupSpansAgainst on the same corpus/batch") {
    GramIndex.write(corpus, "gramidx", spec)
    val viaIndex = rows(GramIndex.probe(spark, batch, "gramidx", spec))
    val recompute = rows(Dedup.dupSpansAgainst(batch, corpus, minLen = 8))
    viaIndex shouldBe recompute
    viaIndex shouldBe Seq((1L, 4L, 10L, 3L)) // the corpus-backed tail only
  }

  test("append equals rebuild; compact dedups files without changing results") {
    GramIndex.write(corpus, "gramidx_a", spec)
    // doc 2's text joins the corpus (as if its shard was accepted)
    val accepted = docsDF(200L -> (0 until 15).map(i => s"z$i").mkString(" "))
    GramIndex.append(accepted, "gramidx_a", spec)
    GramIndex.write(corpus.unionByName(accepted), "gramidx_b", spec)
    val afterAppend = rows(GramIndex.probe(spark, batch, "gramidx_a", spec))
    afterAppend shouldBe rows(GramIndex.probe(spark, batch, "gramidx_b", spec))
    // doc 2 is now corpus-backed end-to-end
    afterAppend should contain((2L, 0L, 15L, 8L))
    // appending the SAME shard twice duplicates gram rows; compact
    // dedups them and results are unchanged
    GramIndex.append(accepted, "gramidx_a", spec)
    GramIndex.compact(spark, "gramidx_a", spec)
    rows(GramIndex.probe(spark, batch, "gramidx_a", spec)) shouldBe afterAppend
    spark.table("gramidx_a_grams").count() shouldBe
      spark.table("gramidx_a_grams").distinct().count()
  }

  private def scrubRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq

  test("scrubProbe equals spanScrub on the union restricted to batch docs") {
    // owners interleave on purpose: batch ids sit both below (1, 2, 7, 9)
    // and above (300) the corpus ids, and one template is batch-only
    val p = (0 until 9).map(i => s"p$i").mkString(" ")
    val corpusU = corpus.unionByName(docsDF(
      200L -> (0 until 15).map(i => s"z$i").mkString(" ")))
    val batchU = docsDF(
      1L -> ((0 until 4).map(i => s"b$i") ++ w.take(10)).mkString(" "),
      2L -> (0 until 15).map(i => s"z$i").mkString(" "),
      300L -> w.take(12).mkString(" "),
      7L -> p,
      9L -> (Seq("y0", "y1") ++ (0 until 9).map(i => s"p$i")).mkString(" "))
    GramIndex.write(corpusU, "gramidx_s", spec)
    val viaIndex = scrubRows(GramIndex.scrubProbe(spark, batchU, "gramidx_s", spec))
    val reference = scrubRows(
      Dedup.spanScrub(corpusU.unionByName(batchU), minLen = 8)
        .join(batchU.select("doc_id"), Seq("doc_id"), "left_semi"))
    viaIndex shouldBe reference
    // sanity on the fixture's intent: 300 fully scrubbed (corpus-owned
    // grams), 9 partially scrubbed (batch-only template owned by 7);
    // 1, 2 and 7 own their templates (min doc_id) and are untouched
    viaIndex.map(_._1) shouldBe Seq(9L, 300L)
    val d300 = viaIndex.find(_._1 == 300L).get
    (d300._2, d300._3, d300._4) shouldBe ((12L, 12L, 0L))
    val d9 = viaIndex.find(_._1 == 9L).get
    (d9._2, d9._3) shouldBe ((11L, 9L))
  }

  test("append min-merges owners at probe time; compact preserves minima") {
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    GramIndex.write(docsDF(100L -> shared), "gramidx_o", spec)
    // standing owner 100: a larger batch doc scrubs, a smaller one owns
    GramIndex.scrubProbe(spark, docsDF(500L -> shared), "gramidx_o", spec)
      .count() shouldBe 1
    GramIndex.scrubProbe(spark, docsDF(5L -> shared), "gramidx_o", spec)
      .count() shouldBe 0
    // append introduces a SMALLER owner (50) for the same grams: the
    // un-compacted table now holds duplicate gram rows with owners
    // {100, 50}; the probe's min-merge must already see 50
    GramIndex.append(docsDF(50L -> shared), "gramidx_o", spec)
    GramIndex.scrubProbe(spark, docsDF(70L -> shared), "gramidx_o", spec)
      .count() shouldBe 1 // 70 > 50: scrubbed
    GramIndex.scrubProbe(spark, docsDF(40L -> shared), "gramidx_o", spec)
      .count() shouldBe 0 // 40 < 50: owns
    // compact folds the min-merge into the table: one row per gram,
    // owner = 50, probe behavior unchanged
    GramIndex.compact(spark, "gramidx_o", spec)
    spark.table("gramidx_o_grams").count() shouldBe
      spark.table("gramidx_o_grams").select("gram").distinct().count()
    spark.table("gramidx_o_grams").agg(max(col("owner"))).collect()(0)
      .getLong(0) shouldBe 50L
    GramIndex.scrubProbe(spark, docsDF(70L -> shared), "gramidx_o", spec)
      .count() shouldBe 1
    GramIndex.scrubProbe(spark, docsDF(40L -> shared), "gramidx_o", spec)
      .count() shouldBe 0
  }

  test("compact crash window is recoverable: _old and _compact both hold full data") {
    // Simulate the crash BETWEEN the two renames of the crash-safe swap
    // (ADVICE r12 #3): live table absent, `_old` (full standing data)
    // and `_compact` (full rewrite) both present. Recovery = rename
    // either back; results must be unchanged.
    val shared = (0 until 10).map(i => s"r$i").mkString(" ")
    GramIndex.write(docsDF(100L -> shared), "gramidx_r", spec)
    val before = scrubRows(GramIndex.scrubProbe(spark, docsDF(500L -> shared), "gramidx_r", spec))
    // reproduce compact's state at the crash point by hand
    spark.sql("DROP TABLE IF EXISTS `gramidx_r_grams_compact`")
    spark.sql("CREATE TABLE `gramidx_r_grams_compact` AS SELECT * FROM `gramidx_r_grams`")
    spark.sql("ALTER TABLE `gramidx_r_grams` RENAME TO `gramidx_r_grams_old`")
    // crash here: no live table — both recovery candidates exist
    spark.catalog.tableExists("gramidx_r_grams") shouldBe false
    spark.sql("ALTER TABLE `gramidx_r_grams_old` RENAME TO `gramidx_r_grams`")
    scrubRows(GramIndex.scrubProbe(spark, docsDF(500L -> shared), "gramidx_r", spec)) shouldBe before
    // the OTHER recovery path (promote the rewrite) is equivalent
    spark.sql("ALTER TABLE `gramidx_r_grams` RENAME TO `gramidx_r_grams_old2`")
    spark.sql("ALTER TABLE `gramidx_r_grams_compact` RENAME TO `gramidx_r_grams`")
    scrubRows(GramIndex.scrubProbe(spark, docsDF(500L -> shared), "gramidx_r", spec)) shouldBe before
    // and the next compact clears the stale side table
    GramIndex.compact(spark, "gramidx_r", spec)
    scrubRows(GramIndex.scrubProbe(spark, docsDF(500L -> shared), "gramidx_r", spec)) shouldBe before
  }

  test("tiered segments: probe/scrub read base+deltas; minor compact ≡ major compact") {
    val t1 = (0 until 10).map(i => s"ta$i").mkString(" ")
    val t2 = (0 until 10).map(i => s"tb$i").mkString(" ")
    val t3 = (0 until 10).map(i => s"tc$i").mkString(" ")
    GramIndex.write(docsDF(100L -> t1), "gramidx_t", spec)
    GramIndex.append(docsDF(200L -> t2), "gramidx_t", spec)
    GramIndex.append(docsDF(300L -> t3), "gramidx_t", spec)
    // two delta segments stand beside the base
    spark.catalog.tableExists("gramidx_t_grams_d1_1") shouldBe true
    spark.catalog.tableExists("gramidx_t_grams_d2_2") shouldBe true
    // a batch hitting all three segments scrubs identically at every
    // compaction state
    val batch = docsDF(900L -> t1, 901L -> t2, 902L -> t3)
    val before = scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_t", spec))
    before.map(_._1) shouldBe Seq(900L, 901L, 902L) // all corpus-owned
    // MINOR compact: deltas fold into one range-named segment, base
    // untouched, results unchanged
    GramIndex.compactDelta(spark, "gramidx_t", spec)
    spark.catalog.tableExists("gramidx_t_grams_d1_2") shouldBe true
    spark.catalog.tableExists("gramidx_t_grams_d1_1") shouldBe false
    scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_t", spec)) shouldBe before
    // append after the fold picks a fresh id ABOVE the merged range
    GramIndex.append(docsDF(400L -> t1), "gramidx_t", spec)
    spark.catalog.tableExists("gramidx_t_grams_d3_3") shouldBe true
    scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_t", spec)) shouldBe before
    // MAJOR compact: one base, no deltas, one row per (gram, source)
    GramIndex.compact(spark, "gramidx_t", spec)
    spark.catalog.tableExists("gramidx_t_grams_d1_2") shouldBe false
    spark.catalog.tableExists("gramidx_t_grams_d3_3") shouldBe false
    scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_t", spec)) shouldBe before
    spark.table("gramidx_t_grams").count() shouldBe
      spark.table("gramidx_t_grams").select("gram", "source").distinct().count()
  }

  test("compaction crash windows: merged-segment subsumption and covers-property") {
    val t1 = (0 until 10).map(i => s"ua$i").mkString(" ")
    val t2 = (0 until 10).map(i => s"ub$i").mkString(" ")
    GramIndex.write(docsDF(100L -> t1), "gramidx_u", spec)
    GramIndex.append(docsDF(200L -> t1), "gramidx_u", spec) // dup grams, larger owner
    GramIndex.append(docsDF(300L -> t2), "gramidx_u", spec)
    val batch = docsDF(900L -> t1, 901L -> t2)
    val before = scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_u", spec))
    // simulate a minor-compact crash AFTER the merged segment's rename
    // but BEFORE the input drops: d1_2 exists alongside d1_1 and d2_2 —
    // readers must use the merged segment and ignore the contained ones
    // (double-reading would double n_occ and is pinned by sourceStats)
    spark.sql("CREATE TABLE `gramidx_u_grams_d1_2` AS " +
      "SELECT gram, min(owner) AS owner, source, " +
      "CAST(sum(n_docs) AS BIGINT) AS n_docs, CAST(sum(n_occ) AS BIGINT) AS n_occ " +
      "FROM (SELECT * FROM `gramidx_u_grams_d1_1` UNION ALL SELECT * FROM `gramidx_u_grams_d2_2`) u " +
      "GROUP BY gram, source")
    scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_u", spec)) shouldBe before
    val occTotal = GramIndex.sourceStats(spark, "gramidx_u")
      .agg(sum(col("n_occ"))).collect()(0).getLong(0)
    // 3 docs x 10 tokens x minLen 8 = 3 windows x ... : just pin that the
    // subsumed segments are not double-counted vs a fresh rebuild
    GramIndex.write(docsDF(100L -> t1, 200L -> t1, 300L -> t2), "gramidx_u2", spec)
    GramIndex.sourceStats(spark, "gramidx_u2")
      .agg(sum(col("n_occ"))).collect()(0).getLong(0) shouldBe occTotal
    // simulate a MAJOR-compact crash after the swap but before the
    // delta drops: the covers-property must hide the folded deltas
    GramIndex.compact(spark, "gramidx_u", spec)
    spark.sql("CREATE TABLE `gramidx_u_grams_d1_1` AS SELECT * FROM `gramidx_u_grams` LIMIT 0")
    // an empty stale delta is harmless either way; a FULL stale copy is
    // the dangerous one — plant the pre-compact delta content back
    spark.sql("DROP TABLE `gramidx_u_grams_d1_1`")
    spark.sql("CREATE TABLE `gramidx_u_grams_d1_2` AS SELECT * FROM `gramidx_u_grams`")
    scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_u", spec)) shouldBe before
    GramIndex.sourceStats(spark, "gramidx_u")
      .agg(sum(col("n_occ"))).collect()(0).getLong(0) shouldBe occTotal
    // the next compaction sweeps the stale segment
    GramIndex.compactDelta(spark, "gramidx_u", spec)
    spark.catalog.tableExists("gramidx_u_grams_d1_2") shouldBe false
  }

  test("readers self-heal the major-compact rename window") {
    val shared = (0 until 10).map(i => s"h$i").mkString(" ")
    GramIndex.write(docsDF(100L -> shared), "gramidx_h", spec)
    val batch = docsDF(500L -> shared)
    val before = scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_h", spec))
    // crash between the two renames: no live table, `_old` survives —
    // a probe must recover by itself instead of failing (ADVICE r13 #5)
    spark.sql("ALTER TABLE `gramidx_h_grams` RENAME TO `gramidx_h_grams_old`")
    scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_h", spec)) shouldBe before
    spark.catalog.tableExists("gramidx_h_grams") shouldBe true
    // same for the `_compact`-only state (old already promoted+dropped)
    spark.sql("ALTER TABLE `gramidx_h_grams` RENAME TO `gramidx_h_grams_compact`")
    scrubRows(GramIndex.scrubProbe(spark, batch, "gramidx_h", spec)) shouldBe before
    // and APPEND heals too before allocating its segment id
    GramIndex.write(docsDF(100L -> shared), "gramidx_h2", spec)
    spark.sql("ALTER TABLE `gramidx_h2_grams` RENAME TO `gramidx_h2_grams_old`")
    GramIndex.append(docsDF(50L -> shared), "gramidx_h2", spec)
    GramIndex.scrubProbe(spark, docsDF(70L -> shared), "gramidx_h2", spec)
      .count() shouldBe 1
  }

  test("union-of-bucketed-segments hazard stays fixed: merged stats never double") {
    // Regression pin for the Spark 4.1 unionOutputPartitioning hazard:
    // a Union of same-bucketed segment tables claims its children's
    // hash partitioning while CONCATENATING partitions, so a keyed
    // aggregate planned on top loses the exchange and emits duplicate
    // groups (observed: groupBy(gram, source) over base ∪ delta
    // returned both pre-merge rows; an explicit same-key repartition
    // was elided too). GramIndex readers avoid union claims
    // structurally — this pins the user-visible contracts.
    val shared = (0 until 12).map(i => s"z$i").mkString(" ")
    GramIndex.write(docsDF(100L -> shared), "gramidx_z", spec)
    GramIndex.append(docsDF(50L -> shared), "gramidx_z", spec)
    // sourceStats: ONE row per (gram, source) with summed counts
    val st = GramIndex.sourceStats(spark, "gramidx_z")
    st.count() shouldBe st.select("gram", "source").distinct().count()
    st.agg(min(col("n_docs")), max(col("n_docs"))).collect()(0).toSeq shouldBe Seq(2L, 2L)
    // scrubProbe owner min-merge across segments: 70 > 50 scrubs, 40 < 50 owns
    GramIndex.scrubProbe(spark, docsDF(70L -> shared), "gramidx_z", spec)
      .count() shouldBe 1
    GramIndex.scrubProbe(spark, docsDF(40L -> shared), "gramidx_z", spec)
      .count() shouldBe 0
    // minor compact folds to the same stats
    GramIndex.append(docsDF(60L -> shared), "gramidx_z", spec)
    GramIndex.compactDelta(spark, "gramidx_z", spec)
    val st2 = GramIndex.sourceStats(spark, "gramidx_z")
    st2.count() shouldBe st2.select("gram", "source").distinct().count()
    st2.agg(min(col("n_docs")), max(col("n_docs"))).collect()(0).toSeq shouldBe Seq(3L, 3L)
  }

  test("sourceAffinity serves the q290 matrix from the index, cap honest") {
    val tpl = (0 until 9).map(i => s"af$i").mkString(" ")   // 3-source template
    val tpl2 = (0 until 9).map(i => s"ah$i").mkString(" ")  // a+b-only template
    val solo = (0 until 9).map(i => s"ag$i").mkString(" ")  // source-a only
    val corpus = Seq(
      (1L, tpl, "src_a"), (2L, tpl, "src_b"), (3L, tpl + " " + tpl, "src_c"),
      (4L, solo, "src_a"), (5L, tpl2, "src_a"), (6L, tpl2, "src_b"))
      .toDF("doc_id", "text", "source")
    GramIndex.write(corpus, "gramidx_af", spec)
    val aff = GramIndex.sourceAffinity(spark, "gramidx_af", maxSources = 16)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // each 9-token template is 2 windows of 8; doc 3 carries tpl twice
    aff.map(t => (t._1, t._2)) shouldBe Seq(
      ("src_a", "src_b"), ("src_a", "src_c"), ("src_b", "src_c"))
    // (a,b) share tpl AND tpl2 = 4 templates; the others share tpl = 2
    aff.map(_._3) shouldBe Seq(4L, 2L, 2L)
    // occurrence mass: src_c holds each tpl window twice (doc 3 repeats)
    aff.map(_._4) shouldBe Seq(8L, 6L, 6L)
    aff.foreach { t => t._5 shouldBe 0L } // no over-cap grams at 16
    // a cap BELOW tpl's breadth excludes it from the matrix but counts
    // it: cap=2 -> tpl's 2 windows (3 sources) are wide; only the
    // (a,b)-pair survives, carried by tpl2, and reports them
    val capped = GramIndex.sourceAffinity(spark, "gramidx_af", maxSources = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    capped.toSeq shouldBe Seq(("src_a", "src_b", 2L, 2L))
  }

  test("sourceAffinity plan: derived from index rows only, no gram-side exchange") {
    // VERDICT r13 #4's done-bar: the index-served affinity must never
    // re-read text — every scan is the bucketed `{name}_grams` table —
    // and the only hash exchange is the ≤|sources|²-row pair-grain
    // aggregate (plus the 1-row wide-template census): the gram-grain
    // breadth/cap/pair derivation all run in the index's bucket layout.
    val tpl = (0 until 9).map(i => s"pp$i").mkString(" ")
    GramIndex.write(
      Seq((1L, tpl, "sa"), (2L, tpl, "sb")).toDF("doc_id", "text", "source"),
      "gramidx_pp", spec)
    val plan = GramIndex.sourceAffinity(spark, "gramidx_pp", 16)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "documents"
      plan should not include "text#"
      "Bucketed: true".r.findAllIn(plan).size should be >= 4 // every index scan
      // pair-grain rollup is the ONLY keyed exchange; everything at
      // gram grain stays in the bucket layout
      val keyed = "Exchange hashpartitioning\\(([^)]*)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      keyed.filterNot(_.contains("source_a")) shouldBe empty
    }
  }

  test("probe plan: index read bucketed, no corpus-side exchange") {
    GramIndex.write(corpus, "gramidx_p", spec)
    val plan = GramIndex.probe(spark, batch, "gramidx_p", spec)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      "Bucketed: true".r.findAllIn(plan).size should be >= 1
      // exchanges: the batch grams shuffle into the index bucketing for
      // the semi join + the island window/rollup repartition the seed
      // rows by doc — the index side adds NONE. Pin the count so an
      // index-side exchange regression is visible.
      "Exchange hashpartitioning".r.findAllIn(plan).size should be <= 2
    }
  }

  test("as-of probe: segment history serves point-in-time reads; folded history refuses (VERDICT r15 #10)") {
    val t1 = (0 until 10).map(i => s"pa$i").mkString(" ")
    val t2 = (0 until 10).map(i => s"pb$i").mkString(" ")
    val t3 = (0 until 10).map(i => s"pc$i").mkString(" ")
    GramIndex.write(docsDF(100L -> t1), "gramidx_pit", spec)
    GramIndex.append(docsDF(200L -> t2), "gramidx_pit", spec)
    GramIndex.append(docsDF(300L -> t3), "gramidx_pit", spec)
    // the reference: an index that never saw append 2
    GramIndex.write(docsDF(100L -> t1), "gramidx_pit_ref", spec)
    GramIndex.append(docsDF(200L -> t2), "gramidx_pit_ref", spec)
    val probeB = docsDF(900L -> t2, 901L -> t3)
    val asOf1 = rows(GramIndex.probeAsOf(spark, probeB, "gramidx_pit", 1L, spec))
    asOf1 shouldBe rows(GramIndex.probe(spark, probeB, "gramidx_pit_ref", spec))
    asOf1.map(_._1) shouldBe Seq(900L) // t3 is the future: invisible at asOf 1
    // stats time-travel agrees
    GramIndex.sourceStatsAsOf(spark, "gramidx_pit", 1L)
      .orderBy("gram", "source").collect().map(_.toSeq).toSeq shouldBe
      GramIndex.sourceStats(spark, "gramidx_pit_ref")
        .orderBy("gram", "source").collect().map(_.toSeq).toSeq
    // asOf at the head serves the full corpus
    rows(GramIndex.probeAsOf(spark, probeB, "gramidx_pit", 2L, spec)) shouldBe
      rows(GramIndex.probe(spark, probeB, "gramidx_pit", spec))
    // a merged delta straddling the cut refuses loudly
    GramIndex.compactDelta(spark, "gramidx_pit", spec) // d1_1 + d2_2 -> d1_2
    val e1 = intercept[IllegalArgumentException](
      GramIndex.probeAsOf(spark, probeB, "gramidx_pit", 1L, spec))
    e1.getMessage should include("straddles")
    // ...but the fold boundary itself still serves
    rows(GramIndex.probeAsOf(spark, probeB, "gramidx_pit", 2L, spec)) shouldBe
      rows(GramIndex.probe(spark, probeB, "gramidx_pit", spec))
    // a major compact folds history up to its head: the head itself
    // still serves (it IS the compacted corpus), anything earlier refuses
    GramIndex.compact(spark, "gramidx_pit", spec)
    rows(GramIndex.probeAsOf(spark, probeB, "gramidx_pit", 2L, spec)) shouldBe
      rows(GramIndex.probe(spark, probeB, "gramidx_pit", spec))
    val e2 = intercept[IllegalArgumentException](
      GramIndex.probeAsOf(spark, probeB, "gramidx_pit", 1L, spec))
    e2.getMessage should include("folded")
    // a standing takedown refuses time-travel (retraction rewrites
    // history -- the retracted corpus must not resurface)
    GramIndex.write(docsDF(100L -> t1, 200L -> t2), "gramidx_pit_rt", spec)
    graft.dedup.GramIndex.retract(docsDF(200L -> t2), "gramidx_pit_rt", spec)
    val e3 = intercept[IllegalArgumentException](
      GramIndex.probeAsOf(spark, probeB, "gramidx_pit_rt", 0L, spec))
    e3.getMessage should include("takedown")
    graft.ops.TrackedCache.release(spark)
  }
}

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
}

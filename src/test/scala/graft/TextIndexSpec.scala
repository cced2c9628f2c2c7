package graft

import org.apache.spark.sql.functions._

import graft.text.TextIndex

/** Standing inverted-index contracts: the probe reproduces the direct
  * q63 scan bit-for-bit, appends are pure deltas (build(A)+append(B) ≡
  * build(A∪B)), the probe's posting scan is BUCKET-PRUNED to the query
  * terms, and compaction changes neither results nor the probe plan.
  */
class TextIndexSpec extends SparkSpec {

  private val terms = Seq("join", "stream", "vector")
  private lazy val docs = Tables.documents(spark, sf0001)
    .select("doc_id", "text")

  private def probeRows(name: String, k: Int = 20) =
    TextIndex.probe(spark, name, terms, k).collect().map(_.toSeq).toSeq

  test("probe == direct q63 scan on the same corpus (ranking bit-exact)") {
    TextIndex.write(docs, "tix_direct")
    val direct = SparkEntry.queries("q63_bm25_topk")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    probeRows("tix_direct") shouldBe direct
  }

  test("build(A)+append(B) == build(A∪B): df/stats partials merge on read") {
    val a = docs.where(col("doc_id") % 3 =!= 0)
    val b = docs.where(col("doc_id") % 3 === 0)
    TextIndex.write(docs, "tix_whole")
    TextIndex.write(a, "tix_inc")
    TextIndex.append(b, "tix_inc")
    probeRows("tix_inc") shouldBe probeRows("tix_whole")
  }

  test("probe scan is bucket-pruned to the query terms") {
    TextIndex.write(docs, "tix_prune", TextIndex.Spec(buckets = 64))
    val plan = TextIndex.probe(spark, "tix_prune", terms)
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    sel.isDefined shouldBe true // bucketed scan + pruning actually applied
    sel.get.group(1).toInt should be <= terms.length
    sel.get.group(2).toInt shouldBe 64
  }

  test("compact: same results, still bucket-pruned, stat partials folded") {
    val a = docs.where(col("doc_id") % 3 =!= 0)
    val b = docs.where(col("doc_id") % 3 === 0)
    TextIndex.write(a, "tix_cpt")
    TextIndex.append(b, "tix_cpt")
    val before = probeRows("tix_cpt")
    TextIndex.compact(spark, "tix_cpt")
    probeRows("tix_cpt") shouldBe before
    val plan = TextIndex.probe(spark, "tix_cpt", terms)
      .queryExecution.executedPlan.toString
    plan should include("SelectedBucketsCount")
    // partials folded: one overall stats row, one row per term
    spark.table("tix_cpt_stats").count() shouldBe 1L
    val ts = spark.table("tix_cpt_termstats")
    ts.count() shouldBe ts.select("term").distinct().count()
  }

  test("maintain: compacts only past the partial threshold, results unchanged") {
    val a = docs.where(col("doc_id") % 3 === 1)
    TextIndex.write(a, "tix_mnt")
    val before = probeRows("tix_mnt")
    // fresh index: 1 partial, under any threshold — no compaction
    TextIndex.maintain(spark, "tix_mnt", maxPartials = 2) shouldBe false
    TextIndex.append(docs.where(col("doc_id") % 3 === 2), "tix_mnt")
    TextIndex.append(docs.where(col("doc_id") % 3 === 0), "tix_mnt")
    // 3 partials > 2 — compaction fires and folds them to one
    TextIndex.maintain(spark, "tix_mnt", maxPartials = 2) shouldBe true
    spark.table("tix_mnt_stats").count() shouldBe 1L
    // post-maintain probe equals the whole-corpus index
    TextIndex.write(docs, "tix_mnt_whole")
    probeRows("tix_mnt") shouldBe probeRows("tix_mnt_whole")
    before should not be empty
  }

  test("retract ≡ rebuild-without-docs (df-shifted BM25 ranking), replay-idempotent; compact physically reclaims") {
    val keep = docs.where(col("doc_id") % 5 =!= 2)
    val gone = docs.where(col("doc_id") % 5 === 2)
    TextIndex.write(docs, "tix_ret")
    TextIndex.writePositional(docs, "tix_ret")
    TextIndex.write(keep, "tix_ret_ref")
    TextIndex.writePositional(keep, "tix_ret_ref")
    TextIndex.retract(spark, "tix_ret", gone.select("doc_id"))
    // the WHOLE ranking (k = 500 ≫ corpus), not just top-20: df and
    // N/avgdl all shifted — every surviving score must equal the
    // rebuild's bit-for-bit for the order to match at full depth
    probeRows("tix_ret", k = 500) shouldBe probeRows("tix_ret_ref", k = 500)
    // replay / overlapping second takedown of the same ids: the side
    // table distincts on read — corrections never double-apply
    TextIndex.retract(spark, "tix_ret", gone.select("doc_id"))
    probeRows("tix_ret", k = 500) shouldBe probeRows("tix_ret_ref", k = 500)
    // retracting a never-indexed id is a no-op (no posting rows)
    TextIndex.retract(spark, "tix_ret",
      spark.range(9000000, 9000003).select(col("id").as("doc_id")))
    probeRows("tix_ret", k = 500) shouldBe probeRows("tix_ret_ref", k = 500)
    // the probe stays bucket-pruned with tombstones standing
    val plan = TextIndex.probe(spark, "tix_ret", terms)
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    sel.isDefined shouldBe true
    sel.get.group(1).toInt should be <= terms.length
    // the positional twin drops retracted docs too
    val phrase = Seq("big", "order", "scan")
    def phraseRows(n: String) = TextIndex.phraseSearch(spark, n, phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    phraseRows("tix_ret") shouldBe phraseRows("tix_ret_ref")
    // compact: physical reclamation — retracted posting/positional rows
    // gone, stat tables recomputed from the survivors, side table
    // dropped, results unchanged
    TextIndex.compact(spark, "tix_ret")
    spark.catalog.tableExists("tix_ret_retracted") shouldBe false
    spark.table("tix_ret_postings")
      .join(gone.select("doc_id"), Seq("doc_id"), "left_semi").count() shouldBe 0L
    spark.table("tix_ret_pospostings")
      .join(gone.select("doc_id"), Seq("doc_id"), "left_semi").count() shouldBe 0L
    probeRows("tix_ret", k = 500) shouldBe probeRows("tix_ret_ref", k = 500)
    phraseRows("tix_ret") shouldBe phraseRows("tix_ret_ref")
    // recomputed stats equal the rebuild's folded stats exactly
    TextIndex.compact(spark, "tix_ret_ref")
    spark.table("tix_ret_stats").collect().map(_.toSeq) shouldBe
      spark.table("tix_ret_ref_stats").collect().map(_.toSeq)
    graft.ops.TrackedCache.release(spark)
  }

  test("phraseSearch from the positional index == q179's full-scan join; appends merge; probe bucket-pruned") {
    import graft.text.TextFunctions
    val phrase = Seq("big", "order", "scan") // present in the sf0.001 fixture
    // full-scan reference: q179's (doc_id, pos - i) join over a
    // posexplode of the corpus text
    def reference(corpus: org.apache.spark.sql.DataFrame) = {
      val toks = corpus.select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
        .where(col("tok").isin(phrase: _*))
      phrase.zipWithIndex.map { case (t, i) =>
        toks.where(col("tok") === t)
          .select(col("doc_id"), (col("pos") - i).as("start"))
      }.reduce(_.join(_, Seq("doc_id", "start")))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val expect = reference(docs)
    expect should not be empty // the fixture contains the phrase
    // split build + append must equal the one-shot build (pure deltas)
    TextIndex.writePositional(docs.where(col("doc_id") % 2 === 0), "tix_pos")
    TextIndex.appendPositional(docs.where(col("doc_id") % 2 === 1), "tix_pos")
    val got = TextIndex.phraseSearch(spark, "tix_pos", phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expect
    // the probe reads only the phrase terms' buckets, never the corpus
    val plan = TextIndex.phraseSearch(spark, "tix_pos", phrase)
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    sel.isDefined shouldBe true
    sel.get.group(1).toInt should be <= phrase.length
    // a repeated-term phrase joins the same slice at two offsets
    val rep = TextIndex.phraseSearch(spark, "tix_pos", Seq("hash", "hash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repExpect = {
      val toks = docs.select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
        .where(col("tok") === "hash")
      toks.select(col("doc_id"), col("pos").as("start"))
        .join(toks.select(col("doc_id"), (col("pos") - 1).as("start")),
          Seq("doc_id", "start"))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    rep shouldBe repExpect
  }
}

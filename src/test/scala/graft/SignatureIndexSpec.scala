package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SignatureIndex}
import graft.dedup.SignatureIndex.Spec

/** The standing bucketed signature index: probe parity with the
  * DataFrame-to-DataFrame incremental dedup, plan shape (the corpus
  * side is never exchanged), and bucketed append. */
class SignatureIndexSpec extends SparkSpec {

  private val spec = Spec(bands = 4, rowsPerBand = 8, buckets = 8)

  private def sigsOf(minId: Long, maxId: Long) = {
    val docs = Tables.documents(spark, sf0001)
      .where(col("doc_id") >= minId && col("doc_id") < maxId)
    Dedup.minhashSignatures(docs, k = spec.bands * spec.rowsPerBand)
  }

  test("probe against the bucketed index equals minhashCandidatePairsBetween") {
    spark.sql("DROP TABLE IF EXISTS sigidx_banded")
    spark.sql("DROP TABLE IF EXISTS sigidx_sigs")
    val corpusSigs = sigsOf(0, 250).persist()
    val batchSigs = sigsOf(250, 100000).persist()
    SignatureIndex.write(corpusSigs, "sigidx", spec)

    val viaIndex = SignatureIndex.probe(spark, batchSigs, "sigidx", spec, minEst = 0.9)
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaFrames = Dedup.minhashCandidatePairsBetween(
      batchSigs, corpusSigs, spec.bands, spec.rowsPerBand, minEst = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    viaIndex shouldBe viaFrames
    viaIndex should not be empty // fixture has cross-split near-dups
  }

  test("index-side plans have no exchange: skew cap and candidate join read buckets in place") {
    // the skew-cap aggregate groups by exactly the bucketing columns
    val capPlan = spark.table("sigidx_banded")
      .groupBy("band", "bh").count()
      .queryExecution.executedPlan.toString
    withClue(capPlan) {
      capPlan.contains("Exchange") shouldBe false
    }
    // in the full probe, the index's banded scan must not sit under an
    // exchange — only the arriving batch shuffles into the bucketing.
    // Count hash exchanges: candidate join (batch side only) + the two
    // verification attaches + final distinct still exchange the SMALL
    // side / pair ids, but adding an index-side exchange would raise
    // the count; pin the exact number so a regression is visible.
    val probePlan = SignatureIndex.probe(spark, sigsOf(250, 100000), "sigidx", spec, minEst = 0.9)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(probePlan).size
    val bucketedScans = "Bucketed: true".r.findAllIn(probePlan).size
    withClue(probePlan) {
      bucketedScans should be >= 2 // banded + sigs index tables read bucketed
      // batch banding into the join (×2: within + star arms), batch
      // sigs attach, union-distinct, pair shuffle onto corpus sigs
      // buckets — but still no corpus-side exchange: the index's banded
      // scan and the skew-cap/anchor aggregate read buckets in place
      exchanges should be <= 6
    }
  }

  test("bucketed append advances the index without rewriting standing data") {
    spark.sql("DROP TABLE IF EXISTS sigidx2_banded")
    spark.sql("DROP TABLE IF EXISTS sigidx2_sigs")
    val first = sigsOf(0, 100).persist()
    val second = sigsOf(100, 250).persist()
    SignatureIndex.write(first, "sigidx2", spec)
    SignatureIndex.append(second, "sigidx2", spec)

    spark.table("sigidx2_sigs").count() shouldBe (first.count() + second.count())
    // probing the appended index equals probing a from-scratch index
    // over the union
    spark.sql("DROP TABLE IF EXISTS sigidx3_banded")
    spark.sql("DROP TABLE IF EXISTS sigidx3_sigs")
    SignatureIndex.write(first.union(second), "sigidx3", spec)
    val batch = sigsOf(250, 100000)
    def probeSet(name: String) =
      SignatureIndex.probe(spark, batch, name, spec, minEst = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probeSet("sigidx2") shouldBe probeSet("sigidx3")
  }

  test("dedupAgainst the index equals dedupIncrementalSigs on the same split") {
    val docs = Tables.documents(spark, sf0001)
    val batch = docs.where(col("doc_id") >= 250)
    val sigs = Dedup.minhashSignatures(docs, k = spec.bands * spec.rowsPerBand).persist()
    val corpusSigs = sigs.where(col("doc_id") < 250)
    val batchSigs = sigs.where(col("doc_id") >= 250)
    spark.sql("DROP TABLE IF EXISTS sigidx4_banded")
    spark.sql("DROP TABLE IF EXISTS sigidx4_sigs")
    SignatureIndex.write(corpusSigs, "sigidx4", spec)

    val viaIndex = SignatureIndex.dedupAgainst(spark, batch, batchSigs,
      "sigidx4", spec, minEst = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaFrames = Dedup.dedupIncrementalSigs(batch, batchSigs, corpusSigs,
      spec.bands, spec.rowsPerBand, minEst = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    viaIndex shouldBe viaFrames
  }

  test("selfPairs equals minhashCandidatePairs row-for-row (both dedup placements)") {
    // the shared-pipeline contract (VERDICT r8 item 7): corpus-level
    // candidate pairs served from the standing index must be value-
    // identical to the from-scratch derivation — loose threshold
    // (dedup-after placement) and tight threshold (dedup-first) both,
    // and with a tiny bucketCap so the star-anchor arm is exercised
    val corpusSigs = sigsOf(0, 400).persist()
    SignatureIndex.write(corpusSigs, "sigidx_self", spec)
    for ((minEst, cap) <- Seq((0.5, 1000), (0.9, 1000), (0.5, 3))) {
      val viaIndex = SignatureIndex.selfPairs(spark, "sigidx_self", spec, minEst, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val viaFrames = Dedup.minhashCandidatePairs(
        corpusSigs, spec.bands, spec.rowsPerBand, minEst, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      withClue(s"minEst=$minEst cap=$cap") { viaIndex shouldBe viaFrames }
    }
    // the fixture has exact-dup families: pairs must exist at 0.9
    SignatureIndex.selfPairs(spark, "sigidx_self", spec, 0.9).count() should be > 0L
  }

  test("selfPairs plan: corpus banded scan is read bucketed, skew cap has no exchange") {
    val plan = SignatureIndex.selfPairs(spark, "sigidx_self", spec, minEst = 0.9)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      "Bucketed: true".r.findAllIn(plan).size should be >= 2 // banded + sigs
      // the skew-cap aggregate alone must plan with zero exchange
      val capPlan = spark.table("sigidx_self_banded")
        .groupBy("band", "bh").count().queryExecution.executedPlan.toString
      capPlan.contains("Exchange") shouldBe false
    }
  }

  test("probing with an empty batch returns empty, not an error") {
    val empty = sigsOf(0, 250).where(org.apache.spark.sql.functions.lit(false))
    SignatureIndex.probe(spark, empty, "sigidx", spec, minEst = 0.9).count() shouldBe 0
  }
}

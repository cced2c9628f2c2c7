package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.RelationalOps

/** Degenerate-input behavior for the dedup/similarity operators —
  * empty frames and single elements must flow through every stage
  * without exceptions (at 100 TB, an empty partition-day or an empty
  * arriving batch is routine, not exceptional).
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val oneDoc =
    Seq(1L -> "a single document with several tokens").toDF("doc_id", "text")

  test("minhash pipeline on empty and single-doc corpora") {
    Dedup.minhashSignatures(emptyDocs).count() shouldBe 0
    val pairs = Dedup.minhashCandidatePairs(Dedup.minhashSignatures(oneDoc))
    pairs.count() shouldBe 0 // no self-pairs
    Dedup.dedupByClusters(oneDoc, Dedup.nearDupClusters(pairs)).count() shouldBe 1
  }

  test("incremental dedup with an empty batch and an empty corpus") {
    // empty batch vs real corpus → nothing kept, nothing thrown
    Dedup.dedupIncremental(emptyDocs, oneDoc).count() shouldBe 0
    // real batch vs empty corpus → everything kept (only within-batch dedup)
    Dedup.dedupIncremental(oneDoc, emptyDocs).count() shouldBe 1
  }

  test("similarityJoin with an empty side and with no shared grams") {
    RelationalOps.similarityJoin(
      emptyDocs, "doc_id", "text", oneDoc, "doc_id", "text", 0.1).count() shouldBe 0
    val disjoint = Seq(2L -> "zzz qqq xxx").toDF("doc_id", "text")
    RelationalOps.similarityJoin(
      oneDoc, "doc_id", "text", disjoint, "doc_id", "text", 0.1).count() shouldBe 0
  }

  test("simhash and winnowing on empty-ish text") {
    val weird = Seq(1L -> "", 2L -> " ", 3L -> "ab").toDF("doc_id", "text")
    Dedup.simhash(weird).count() shouldBe 3 // no exceptions, one fp per doc
    weird.select(graft.text.TextFunctions.winnowFingerprints(col("text")).as("fp"))
      .collect().foreach(r => r.getSeq[Long](0).length should be >= 1)
  }
}

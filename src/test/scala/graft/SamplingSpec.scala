package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic-sampling contracts: the sampled SET is a function of
  * the rows, not the partitioning — the property rand()-based sample()
  * lacks and the one that makes dataset versions reproducible.
  */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("hashSample: partitioning-independent, nested fractions, roughly unbiased") {
    val s20 = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val repart = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    repart shouldBe s20 // same SET whatever the layout
    val s10 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    s10.subsetOf(s20) shouldBe true // nested: smaller fraction ⊂ larger
    val n = docs.count().toDouble
    s20.size.toDouble should (be > 0.1 * n and be < 0.3 * n) // ~20%
  }

  test("stratifiedSample: exactly min(k, |stratum|) per stratum, stable under repartition") {
    val out = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), 5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, sz) => byLang(lang) shouldBe math.min(5L, sz) }
    val again = Sampling.stratifiedSample(docs.repartition(7), col("lang"), col("doc_id"), 5)
    again.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      out.select("doc_id").collect().map(_.getLong(0)).sorted
  }
}

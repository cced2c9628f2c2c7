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

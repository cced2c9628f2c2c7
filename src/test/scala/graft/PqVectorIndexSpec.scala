package graft

import org.apache.spark.sql.functions._

import graft.sim.{IvfIndex, PqIndex, PqVectorIndex}

/** The standing IVF-PQ index: search parity with the in-plan
  * cell-gated ADC, float-exact codebook round-trip, DPP on probes,
  * and partitioned append with the standing quantizer. */
class PqVectorIndexSpec extends SparkSpec {

  private val ivf = new IvfIndex(nCells = 8, nProbe = 3)
  private val pq = new PqIndex(dim = 64, m = 8, ksub = 16)
  private lazy val tmp = java.nio.file.Files
    .createTempDirectory("graft-pqvecidx").toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("topK against the standing index equals annTopKIvf on the in-plan corpus") {
    val e = Tables.embeddings(spark, sf0001)
    PqVectorIndex.write(e, s"$tmp/idx1", ivf, ivf.centroidsOf(e), pq, pq.codebookOf(e))
    val queries = e.where(col("vec_id") < 5)
    val viaIndex = rows(PqVectorIndex.topK(spark, s"$tmp/idx1", queries, 3, ivf, pq))
    val inPlan = rows(pq.annTopKIvf(e, queries, 3, ivf))
    viaIndex shouldBe inPlan
    viaIndex should not be empty
  }

  test("codebook and centroids round-trip float-exact") {
    val e = Tables.embeddings(spark, sf0001)
    val cents = ivf.centroidsOf(e)
    val cb = pq.codebookOf(e)
    PqVectorIndex.write(e.limit(50), s"$tmp/idx2", ivf, cents, pq, cb)
    val backC = PqVectorIndex.readCentroids(spark, s"$tmp/idx2")
    backC.map(_._1) shouldBe cents.map(_._1)
    backC.zip(cents).foreach { case ((_, a), (_, b)) => a shouldBe b }
    val backB = PqVectorIndex.readCodebook(spark, s"$tmp/idx2")
    backB.length shouldBe cb.length
    for (j <- cb.indices; c <- cb(j).indices) backB(j)(c) shouldBe cb(j)(c)
  }

  test("probe join dynamically prunes the index's cell partitions") {
    val e = Tables.embeddings(spark, sf0001)
    val out = PqVectorIndex.topK(spark, s"$tmp/idx1",
      e.where(col("vec_id") < 2), 3, ivf, pq)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    withClue(plan) {
      plan.toLowerCase.contains("dynamicpruning") shouldBe true
    }
  }

  test("partitioned append with the standing quantizer answers like a from-scratch index") {
    val e = Tables.embeddings(spark, sf0001)
    val cents = ivf.centroidsOf(e)
    val cb = pq.codebookOf(e)
    PqVectorIndex.write(e.where(col("vec_id") % 2 === 0), s"$tmp/idx3", ivf, cents, pq, cb)
    val before = new java.io.File(s"$tmp/idx3/cells")
      .listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getPath).toSet
    PqVectorIndex.append(e.where(col("vec_id") % 2 === 1), s"$tmp/idx3", ivf)
    val after = new java.io.File(s"$tmp/idx3/cells")
      .listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getPath).toSet
    after.intersect(before) shouldBe before // standing files untouched
    PqVectorIndex.write(e, s"$tmp/idx4", ivf, cents, pq, cb)
    val queries = e.where(col("vec_id") < 5)
    rows(PqVectorIndex.topK(spark, s"$tmp/idx3", queries, 3, ivf, pq)) shouldBe
      rows(PqVectorIndex.topK(spark, s"$tmp/idx4", queries, 3, ivf, pq))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sim.{IvfIndex, VectorIndex}

/** The standing cell-partitioned IVF index: search parity with the
  * in-plan IvfIndex, runtime partition pruning on probes, and
  * partitioned append. */
class VectorIndexSpec extends SparkSpec {

  private val ivf = new IvfIndex(nCells = 8, nProbe = 3)
  private lazy val tmp = java.nio.file.Files
    .createTempDirectory("graft-vecidx").toString

  test("topK against the standing index equals annTopK on the in-plan corpus") {
    val e = Tables.embeddings(spark, sf0001)
    val cents = ivf.centroidsOf(e)
    VectorIndex.write(e, s"$tmp/idx1", ivf, cents)

    val queries = e.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaIndex = rows(VectorIndex.topK(spark, s"$tmp/idx1", queries, 3, ivf))
    val inPlan = rows(ivf.annTopKWith(e, queries, 3, cents))
    viaIndex shouldBe inPlan
    viaIndex should not be empty
  }

  test("probe join dynamically prunes the index's cell partitions") {
    val e = Tables.embeddings(spark, sf0001)
    val queries = e.where(col("vec_id") < 2)
    val out = VectorIndex.topK(spark, s"$tmp/idx1", queries, 3, ivf)
    // materialize so AQE finalizes, then read the executed plan: the
    // index scan's partition filters must carry a runtime (dynamic
    // pruning) predicate on cell, not scan all 8 cell directories
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    withClue(plan) {
      plan.toLowerCase.contains("dynamicpruning") shouldBe true
    }
  }

  test("partitioned append adds vectors without rewriting standing cells") {
    val e = Tables.embeddings(spark, sf0001)
    val cents = ivf.centroidsOf(e)
    val first = e.where(col("vec_id") % 2 === 0)
    val second = e.where(col("vec_id") % 2 === 1)
    VectorIndex.write(first, s"$tmp/idx2", ivf, cents)
    val filesBefore = new java.io.File(s"$tmp/idx2/cells")
      .listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getPath).toSet
    VectorIndex.append(second, s"$tmp/idx2", ivf)
    val filesAfter = new java.io.File(s"$tmp/idx2/cells")
      .listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getPath).toSet
    filesAfter.intersect(filesBefore) shouldBe filesBefore // standing files untouched

    // the appended index answers like a from-scratch index on the union
    VectorIndex.write(e, s"$tmp/idx3", ivf, cents)
    val queries = e.where(col("vec_id") < 5)
    def rows(dir: String) =
      VectorIndex.topK(spark, dir, queries, 3, ivf)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    rows(s"$tmp/idx2") shouldBe rows(s"$tmp/idx3")
  }

  test("centroids round-trip float-exact") {
    val e = Tables.embeddings(spark, sf0001)
    val cents = ivf.centroidsOf(e)
    VectorIndex.write(e.limit(50), s"$tmp/idx4", ivf, cents)
    val back = VectorIndex.readCentroids(spark, s"$tmp/idx4")
    back.map(_._1) shouldBe cents.map(_._1)
    back.zip(cents).foreach { case ((_, a), (_, b)) => a shouldBe b }
  }
}

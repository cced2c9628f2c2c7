package graft

import org.apache.spark.sql.functions._

import graft.sim.{RandomHyperplaneLsh, VectorFunctions}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecsDF(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("dot / norm / cosine basic identities") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, -5f, 6f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.norm(col("a")).as("na"),
      VectorFunctions.cosine(col("a"), col("a")).as("self")).collect()(0)
    r.getDouble(0) shouldBe (4.0 - 10.0 + 18.0)
    r.getDouble(1) shouldBe math.sqrt(14.0) +- 1e-12
    r.getDouble(2) shouldBe 1.0 +- 1e-12
  }

  test("cosine of orthogonal vectors is 0, opposite is -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f))).toDF("a", "b")
    val out = df.select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    out(0) shouldBe 0.0 +- 1e-12
    out(1) shouldBe -1.0 +- 1e-12
  }

  test("bruteForceTopK: exact neighbor ranking, self excluded") {
    val corpus = vecsDF(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.9f, 0.1f),  // closest to 0
      2L -> Seq(0f, 1f),      // orthogonal
      3L -> Seq(-1f, 0f))     // opposite
    val out = VectorFunctions.bruteForceTopK(corpus, corpus.where(col("vec_id") === 0), k = 3)
      .orderBy("rank").collect()
    out.map(_.getAs[Long]("neighbor_id")) shouldBe Array(1L, 2L, 3L)
    out.map(_.getAs[Int]("rank")) shouldBe Array(1, 2, 3)
  }

  test("RandomHyperplaneLsh: bucket is deterministic and identical vectors collide") {
    val lsh = new RandomHyperplaneLsh(dim = 4, planes = 6)
    val df = vecsDF(1L -> Seq(1f, 2f, 3f, 4f), 2L -> Seq(1f, 2f, 3f, 4f),
                    3L -> Seq(-1f, -2f, -3f, -4f))
    val out = df.select(col("vec_id"), lsh.bucket(col("embedding")).as("b"))
      .orderBy("vec_id").collect()
    out(0).getInt(1) shouldBe out(1).getInt(1)
    // antipodal vector flips every sign bit → complementary bucket
    out(2).getInt(1) shouldBe ((~out(0).getInt(1)) & ((1 << 6) - 1))
  }

  test("annTopK finds an exact duplicate in the same bucket") {
    val lsh = new RandomHyperplaneLsh(dim = 3, planes = 4)
    val corpus = vecsDF(
      0L -> Seq(1f, 2f, 3f), 1L -> Seq(1f, 2f, 3f), 2L -> Seq(5f, -1f, 0f))
    val out = lsh.annTopK(corpus, corpus.where(col("vec_id") === 0), k = 1).collect()
    out.length shouldBe 1
    out(0).getAs[Long]("neighbor_id") shouldBe 1L
    out(0).getAs[Double]("cos") shouldBe 1.0 +- 1e-12
  }

  test("hyperplanes are reproducible across instances (seeded, no RNG state)") {
    val a = new RandomHyperplaneLsh(dim = 8, planes = 3)
    val b = new RandomHyperplaneLsh(dim = 8, planes = 3)
    a.hyperplanes shouldBe b.hyperplanes
  }

  test("HyperplaneBuckets: fused native buckets equal the HOF bucket() per table " +
      "on fixture embeddings (bit-identical fold)") {
    import org.apache.spark.sql.functions.{array, col}
    val e = Tables.embeddings(spark, sf0001)
    val lshs = (0 until 8).map(t => new RandomHyperplaneLsh(64, 4, seed = 42L + t))
    val viaHof = e.select(col("vec_id"),
        array(lshs.map(l => l.bucket(col("embedding"))): _*).as("b"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    val signs = lshs.map(_.hyperplanes.map(_.toArray).toArray).toArray
    val viaNative = e.select(col("vec_id"),
        org.apache.spark.sql.GraftSqlShim.column(graft.sim.HyperplaneBuckets(
          org.apache.spark.sql.GraftSqlShim.expression(col("embedding")), signs)).as("b"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    viaNative shouldBe viaHof
  }

  test("cosineNearDupPairs: identical vectors found in every table, orthogonal ones not") {
    val corpus = vecsDF(
      0L -> Seq(1f, 2f, 3f, 4f),
      1L -> Seq(1f, 2f, 3f, 4f),       // exact duplicate of 0 → cos 1.0
      2L -> Seq(2f, 4f, 6f, 8f),       // colinear with 0 → cos 1.0
      3L -> Seq(-4f, 3f, -2f, 1f))     // far from the rest
    val out = VectorFunctions.cosineNearDupPairs(corpus, dim = 4, minCos = 0.95)
      .orderBy("vec_a", "vec_b").collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((0L, 1L), (0L, 2L), (1L, 2L))
    all(out.map(_.getDouble(2))) shouldBe 1.0 +- 1e-12
  }

  test("cosineNearDupPairs hot bucket: two-level refinement keeps a near-identical " +
      "cluster connected via anchor stars; dirty vectors never emit NaN pairs") {
    // 30 near-identical vectors (a boilerplate cluster) + 2 zero vectors
    // + 1 NaN vector, cap 10: every level-1 bucket holding the cluster is
    // over cap; the 16-plane refinement keeps the cluster in one
    // sub-bucket (still over cap) → star pairs to vec_id 0. The exact
    // verify keeps the stars (cos≈1) and the NaN gate drops the dirty
    // pairs (NaN compares GREATER than minCos in Spark — the
    // adversarial sweep measured 600 NaN pairs leaking pre-fix).
    // base chosen so every ±1 projection is ≥ 0.02 in magnitude — the
    // 1e-6 perturbations can never flip a hyperplane sign, so the whole
    // cluster provably shares every bucket AND every refinement
    // sub-bucket (an all-ones base sits exactly ON balanced hyperplanes
    // and scatters)
    val base = Seq(0.83f, -0.41f, 0.67f, 0.29f, -0.74f, 0.56f, 0.18f, -0.92f)
    val cluster = (0L until 30L).map(i =>
      i -> Seq.tabulate(8)(d =>
        base(d) + (if (d == (i % 8).toInt) i * 1e-6f else 0f)))
    val dirty = Seq(
      100L -> Seq.fill(8)(0f),
      101L -> Seq.fill(8)(0f),
      102L -> (Float.NaN +: Seq.fill(7)(1f)))
    val out = VectorFunctions.cosineNearDupPairs(
      vecsDF((cluster ++ dirty): _*), dim = 8, minCos = 0.95, bucketCap = 10)
      .collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the cluster is fully star-connected through its min-id anchor
    (1L until 30L).foreach(i => pairs should contain ((0L, i)))
    // no dirty-vector pair leaks (zero-zero / NaN cosines)
    out.map(_.getDouble(2)).foreach(c => assert(!c.isNaN))
    pairs.foreach { case (a, b) => assert(a < 100L && b < 100L) }
  }

  test("IvfIndex.decontaminate: cell-blocked flags, empty-cell recall bound, NaN immunity") {
    val ivf = new graft.sim.IvfIndex(nCells = 2, nProbe = 1)
    // seed quantizer: cells along the two axes
    val cents = ivf.centroidsOf(vecsDF(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)))
    val bench = vecsDF(5L -> Seq(0.9f, 0.1f)) // lands in cell 0
    val corpus = vecsDF(
      10L -> Seq(1f, 0.05f),                  // cell 0, near the bench vector
      11L -> Seq(0.1f, 1f),                   // cell 1 — no bench there
      12L -> Seq(Float.NaN, 1f))              // dirty: must neither flag nor crash
    val out = ivf.decontaminate(corpus, bench, cents, minCos = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))).toMap
    out(10L)._1 shouldBe 1L
    out(10L)._2.get should be > 0.9
    out(10L)._3 shouldBe true
    out(11L) shouldBe ((0L, None, false)) // empty cell: screened clean by design
    out(12L)._3 shouldBe false            // NaN cosine dropped, not compared true
    out.size shouldBe 3                   // every corpus row reported exactly once
  }
}

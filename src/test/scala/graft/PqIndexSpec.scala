package graft

import org.apache.spark.sql.functions._

import graft.sim.{PqIndex, VectorFunctions}

/** Product-quantization semantics: deterministic codebook seeding,
  * argmin encode with the lowest-id tie-break, and ADC scores that
  * reduce to exact dot products when a vector IS a codebook
  * combination (reconstruction error zero).
  */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors, 4 subspaces of 2 dims, 4 centroids per subspace
  private val pq = new PqIndex(dim = 8, m = 4, ksub = 4)

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // seed vectors 0..3 with pairwise-distinct subvectors everywhere
  private val seeds = Seq(
    0L -> vec(1, 0, 1, 0, 1, 0, 1, 0),
    1L -> vec(0, 1, 0, 1, 0, 1, 0, 1),
    2L -> vec(2, 2, 2, 2, 2, 2, 2, 2),
    3L -> vec(-1, 3, -1, 3, -1, 3, -1, 3))

  private def corpusDF(extra: (Long, Seq[Float])*) =
    (seeds ++ extra).toDF("vec_id", "embedding")

  test("encode: each seed vector gets its own code in every subspace") {
    val cb = pq.codebookOf(corpusDF())
    val codes = pq.encode(corpusDF(), cb).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    codes shouldBe seeds.map { case (id, _) => (id, Seq.fill(4)(id.toInt)) }
  }

  test("native PqEncode equals the builtin least-struct formulation on fixture embeddings") {
    val e = Tables.embeddings(spark, sf0001)
    val p = new PqIndex(dim = 64, m = 8, ksub = 16)
    val cb = p.codebookOf(e)
    val native = p.encode(e, cb).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    val builtin = p.encodeViaBuiltins(e, cb).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    native shouldBe builtin
  }

  test("native AdcScore equals the lookup-table formulation on fixture embeddings") {
    val e = Tables.embeddings(spark, sf0001)
    val p = new PqIndex(dim = 64, m = 8, ksub = 16)
    val cb = p.codebookOf(e)
    val codes = p.encode(e, cb)
    val q = e.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("neighbor_id")),
          r.getDouble(r.fieldIndex("score"))))
    rows(p.searchAdc(codes, q, 5, cb)) shouldBe rows(p.searchAdcViaTables(codes, q, 5, cb))
  }

  test("encode: a non-seed vector snaps to its nearest subvectors") {
    val near0 = 10L -> vec(1.1, 0, 1, 0.1, 0.9, 0, 1, 0) // closest to seed 0 in all subspaces
    val cb = pq.codebookOf(corpusDF(near0))
    val codes = pq.encode(corpusDF(near0), cb)
      .where(col("vec_id") === 10L).collect()(0).getSeq[Int](1).toSeq
    codes shouldBe Seq(0, 0, 0, 0)
  }

  test("ADC score equals the exact dot product for zero-reconstruction-error vectors") {
    val df = corpusDF()
    val cb = pq.codebookOf(df)
    val got = pq.searchAdc(pq.encode(df, cb), df.where(col("vec_id") === 2L), k = 3, cb)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val exact = df.where(col("vec_id") =!= 2L)
      .select(col("vec_id"),
        VectorFunctions.dot(col("embedding"),
          typedLit(seeds(2)._2)).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, d) => (-d, id) }
    got shouldBe exact
  }

  test("fit: one Lloyd's round moves each centroid to the mean of its assigned subvectors") {
    // two extra vectors that both encode to seed 0's codes in every
    // subspace — after one round, code 0's centroid in each subspace
    // must be the mean of {seed0, nearA, nearB} subvectors, and codes
    // 1..3 (only their seed assigned) stay at their seed values
    val nearA = 10L -> vec(1.2, 0, 1.2, 0, 1.2, 0, 1.2, 0)
    val nearB = 11L -> vec(0.8, 0, 0.8, 0, 0.8, 0, 0.8, 0)
    val df = corpusDF(nearA, nearB)
    val fitted = pq.fit(df, iters = 1)
    val expected0 = Array((1f + 1.2f + 0.8f) / 3, 0f) // mean of the three subvectors
    for (j <- 0 until 4) {
      fitted(j)(0) shouldBe expected0
      for (c <- 1 until 4) fitted(j)(c) shouldBe pq.codebookOf(df)(j)(c)
    }
  }

  test("fit: codes that lose all members keep their previous centroid") {
    // duplicate seed 0 many times so every non-seed row assigns to code
    // 0; codes 1..3 keep exactly one member (their seed) and code 0's
    // centroid moves — but NO centroid is zeroed or dropped
    val dups = (20L until 24L).map(i => i -> seeds.head._2)
    val fitted = pq.fit(corpusDF(dups: _*), iters = 2)
    fitted.foreach { sub => sub.length shouldBe 4; sub.foreach(_.length shouldBe 2) }
    // code 0 unchanged too here: all its members equal the seed vector
    fitted(0)(0) shouldBe Array(1f, 0f)
  }

  test("fit reduces total quantization error against the seed codebook") {
    val e = Tables.embeddings(spark, sf0001)
    val p = new PqIndex(dim = 64, m = 8, ksub = 16)
    def totalErr(cb: Array[Array[Array[Float]]]): Double = {
      val codes = p.encode(e, cb)
      e.join(codes, "vec_id").collect().map { r =>
        val emb = r.getSeq[Float](r.fieldIndex("embedding"))
        val cs = r.getSeq[Int](r.fieldIndex("codes"))
        (0 until 8).map { j =>
          val cen = cb(j)(cs(j))
          (0 until 8).map { t =>
            val d = emb(j * 8 + t) - cen(t); d.toDouble * d
          }.sum
        }.sum
      }.sum
    }
    val seedErr = totalErr(p.codebookOf(e))
    val fitErr = totalErr(p.fit(e, iters = 3))
    fitErr should be <= seedErr
  }

  test("annTopKIvf: cell-gated ADC equals full-scan ADC restricted to probed cells") {
    val e = Tables.embeddings(spark, sf0001)
    val p = new PqIndex(dim = 64, m = 8, ksub = 16)
    val ivf = new graft.sim.IvfIndex(nCells = 16, nProbe = 16)
    // nProbe = nCells → every cell probed → IVF gating filters nothing
    // and the composed search must equal the exhaustive ADC scan
    val q = e.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
          r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("neighbor_id")),
          r.getDouble(r.fieldIndex("score"))))
    val cb = p.codebookOf(e)
    rows(p.annTopKIvf(e, q, 5, ivf)) shouldBe rows(p.searchAdc(p.encode(e, cb), q, 5, cb))
  }

  test("annTopK: code-identical vectors score identically and rank adjacently") {
    // ADC score is an INNER PRODUCT (query un-normalized) — a copy of
    // the largest-norm seed and the seed itself must tie exactly and
    // resolve by neighbor id
    val dup = 10L -> seeds(2)._2 // same embedding as seed 2
    val query = Seq(20L -> vec(2.1, 2, 2, 2, 2, 2, 2, 2)).toDF("vec_id", "embedding")
    val out = new PqIndex(8, 4, 4).annTopK(corpusDF(dup), query, k = 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(r.fieldIndex("neighbor_id")),
        r.getDouble(r.fieldIndex("score"))))
    out.map(_._1) shouldBe Array(2L, 10L)
    out(0)._2 shouldBe out(1)._2
  }
}

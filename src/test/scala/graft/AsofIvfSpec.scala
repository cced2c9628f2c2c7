package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RelationalOps
import graft.sim.IvfIndex

class AsofIvfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  test("asofJoinLatest: latest right at-or-before left, per key, ties to max payload") {
    val left = Seq(
      (1L, ts(100), "p1"),
      (1L, ts(10), "p2"),   // before any right for user 1 except ts=10 tie
      (2L, ts(50), "p3"))   // user 2 has no rights at all
      .toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts(10), 101L),   // exact tie with p2 → counts (at-or-before)
      (1L, ts(10), 102L),   // same ts → max event_id wins
      (1L, ts(60), 103L))   // latest before p1
      .toDF("user_id", "ts", "event_id")
    val out = RelationalOps.asofJoinLatest(left, right, "user_id", "ts", "ts",
        Seq("event_id", "ts"))
      .select(col("name"), col("asof.event_id").as("matched"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    out("p1") shouldBe Some(103L)
    out("p2") shouldBe Some(102L) // tie at ts=10: at-or-before + max id
    out("p3") shouldBe None       // left-join semantics: null asof
  }

  test("asofJoinLatest never fans out: one output row per left row") {
    val left = (1 to 100).map(i => (1L, ts(i), s"l$i")).toDF("user_id", "ts", "name")
    val right = (1 to 100).map(i => (1L, ts(i), i.toLong)).toDF("user_id", "ts", "event_id")
    RelationalOps.asofJoinLatest(left, right, "user_id", "ts", "ts", Seq("event_id"))
      .count() shouldBe 100
  }

  test("IvfIndex.assign: every vector lands in exactly one cell") {
    val e = Tables.embeddings(spark, sf0001)
    val assigned = new IvfIndex(nCells = 8).assign(e)
    assigned.count() shouldBe e.count()
    assigned.select("cell").distinct().count() should be <= 8L
  }

  test("IvfIndex.annTopK: finds each query itself's duplicate-free neighbors with sane ranks") {
    val e = Tables.embeddings(spark, sf0001)
    val out = new IvfIndex(nCells = 8, nProbe = 3).annTopK(e, e.where(col("vec_id") < 5), k = 3)
    val rows = out.collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      rs.map(_.getAs[Int]("rank")).sorted shouldBe (1 to rs.length).toArray
      rs.map(_.getAs[Long]("neighbor_id")).distinct.length shouldBe rs.length
    }
    all(rows.map(_.getAs[Double]("cos"))) should (be >= -1.0001 and be <= 1.0001)
  }

  test("IvfIndex.fit: Lloyd rounds improve quantization quality; search works with fitted quantizer") {
    val e = Tables.embeddings(spark, sf0001)
    val ivf = new IvfIndex(nCells = 8, nProbe = 3)
    val vecs = e.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // quality = mean best-centroid cosine over the corpus (JVM math —
    // immune to aggregation fp-order)
    def quality(cents: Array[(Int, Array[Float])]): Double =
      vecs.map(v => cents.map(c => cos(v, c._2)).max).sum / vecs.length

    val seed = ivf.centroidsOf(e)
    val fitted = ivf.fit(e, iters = 3)
    fitted.length shouldBe seed.length
    fitted.map(_._1).toSeq shouldBe seed.map(_._1).toSeq // same cells
    fitted.head._2.length shouldBe seed.head._2.length   // same dim
    quality(fitted) should be >= quality(seed) - 1e-9    // Lloyd never hurts here
    // search with the fitted quantizer behaves: contiguous ranks per query
    val out = ivf.annTopKWith(e, e.where(col("vec_id") < 3), 3, fitted).collect()
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      rs.map(_.getAs[Int]("rank")).sorted shouldBe (1 to rs.length).toArray
    }
  }

  test("IvfIndex.annTopKFiltered: predicate holds on every result; subset of unfiltered probe") {
    val e = Tables.embeddings(spark, sf0001)
    val ivf = new IvfIndex(nCells = 8, nProbe = 3)
    val queries = e.where(col("vec_id") < 5)
    val out = ivf.annTopKFiltered(e, queries, k = 3,
      pred = col("label") === col("q_label")).collect()
    out should not be empty
    val labelOf = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every neighbor carries the query's label (the predicate)
    out.foreach { r =>
      labelOf(r.getAs[Long]("neighbor_id")) shouldBe labelOf(r.getAs[Long]("query_id"))
    }
    // ranks contiguous per query, ≤ k rows (post-filter may return fewer)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      rs.length should be <= 3
      rs.map(_.getAs[Int]("rank")).sorted shouldBe (1 to rs.length).toArray
    }
    // filtered results ⊆ the same probe without the predicate (huge k):
    // the filter only removes candidates, never invents them
    val unf = ivf.annTopK(e, queries, k = 10000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    out.foreach { r =>
      unf should contain ((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sim.Mmr

/** MMR greedy-diversification contracts on hand-built candidate
  * frames (the kernel takes (query_id, cand_id, cos) + symmetric
  * (query_id, a, b, sim) — no embeddings needed to pin the greedy). */
class MmrSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    // cand 1: most relevant. cand 2: nearly as relevant but a
    // near-copy of 1. cand 3: less relevant, diverse.
    val cands = Seq(
      (0L, 1L, 0.95), (0L, 2L, 0.94), (0L, 3L, 0.80)
    ).toDF("query_id", "cand_id", "cos")
    val sims = Seq(
      (0L, 1L, 2L, 0.999), (0L, 2L, 1L, 0.999),
      (0L, 1L, 3L, 0.10), (0L, 3L, 1L, 0.10),
      (0L, 2L, 3L, 0.10), (0L, 3L, 2L, 0.10)
    ).toDF("query_id", "a", "b", "sim")
    (cands, sims)
  }

  test("rank 1 is pure relevance; the near-copy of it is demoted below the diverse candidate") {
    val (cands, sims) = frames
    val out = Mmr.rerank(cands, sims, rounds = 3, lambda = 0.5)
      .orderBy("sel_rank").collect()
    out.map(_.getAs[Long]("cand_id")).toSeq shouldBe Seq(1L, 3L, 2L)
    // redundancy penalty visible in the scores: round-2 pick scores
    // 0.5·0.80 − 0.5·0.10, the near-copy would have scored negative
    out(1).getAs[Double]("score") shouldBe (0.5 * 0.80 - 0.5 * 0.10) +- 1e-12
  }

  test("lambda=1 disables the diversity term: output is the relevance top-k") {
    val (cands, sims) = frames
    val out = Mmr.rerank(cands, sims, rounds = 3, lambda = 1.0)
      .orderBy("sel_rank").collect()
    out.map(_.getAs[Long]("cand_id")).toSeq shouldBe Seq(1L, 2L, 3L)
  }

  test("ranks contiguous per query, no candidate selected twice, short lists tolerated") {
    val (cands, sims) = frames
    // rounds beyond the candidate count must not invent selections
    val out = Mmr.rerank(cands, sims, rounds = 5, lambda = 0.5).collect()
    out.length shouldBe 3
    out.map(_.getAs[Long]("cand_id")).distinct.length shouldBe 3
    out.map(_.getAs[Int]("sel_rank")).sorted shouldBe Array(1, 2, 3)
  }

  test("empty candidate frame yields empty output; invalid params rejected") {
    val (cands, sims) = frames
    Mmr.rerank(cands.limit(0), sims.limit(0), rounds = 3, lambda = 0.5)
      .count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Mmr.rerank(cands, sims, rounds = 0, lambda = 0.5)
    an[IllegalArgumentException] should be thrownBy
      Mmr.rerank(cands, sims, rounds = 3, lambda = 1.5)
  }
}

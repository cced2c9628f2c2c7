package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking — the diversification pass a
  * retrieval stack runs AFTER ANN: from each query's candidate list,
  * greedily pick the item maximizing
  * `λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s)` — relevant, but
  * not redundant with what's already picked (the classic fix for "all
  * ten results are the same near-duplicate").
  *
  * Shape: everything is bounded by the CANDIDATE lists, never the
  * corpus — `cands` is k·|Q| rows (the ANN output), `pairSims` at most
  * |cands|² per query (generated candidate×candidate within each
  * query, a self-join on query_id over k-row groups). Each greedy
  * round is a broadcast-join + per-query argmax over those bounded
  * frames: `rounds` small shuffle-free stages, no corpus access at
  * all. The loop is DRIVER-side only in plan construction (rounds is a
  * literal ≤ k); no data ever collects.
  *
  * Determinism: the greedy argmax compares doubles built from
  * bit-portable cosines with single multiply/subtract ops, ties broken
  * by candidate id — so the SELECTION (and thus the output) is exact
  * across engines and the DuckDB oracle unrolls the same rounds.
  *
  * @param cands    (query_id, cand_id, cos) — relevance to the query
  * @param pairSims (query_id, a, b, sim) — candidate-candidate
  *                 similarity, SYMMETRIC (both orientations present)
  * @return (query_id, sel_rank, cand_id, score) — `rounds` rows per
  *         query (fewer if a query has fewer candidates) */
object Mmr {

  def rerank(cands: DataFrame, pairSims: DataFrame, rounds: Int,
             lambda: Double): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(lambda >= 0 && lambda <= 1, s"lambda out of [0,1]: $lambda")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    val chain = graft.ops.Lineage.newChain("mmr")
    // try/finally (ADVICE r11): a mid-loop failure must still drop the
    // chain's bookkeeping entry (a strong SparkSession ref)
    try {
    // round 1: pure relevance (no selected set to be redundant with)
    var selected = cands
      .select(col("query_id"), col("cand_id"), (col("cos") * lambda).as("score"))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("query_id"), lit(1).as("sel_rank"), col("cand_id"), col("score"))
    var r = 2
    while (r <= rounds) {
      // max similarity of each remaining candidate to the selected set
      val maxSim = pairSims
        .join(selected.select(col("query_id"), col("cand_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a").as("cand_id"))
        .agg(max(col("sim")).as("max_sim"))
      val remaining = cands
        .join(selected.select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"), "left_anti")
      val scored = remaining
        .join(maxSim, Seq("query_id", "cand_id"), "left")
        .select(col("query_id"), col("cand_id"),
          (col("cos") * lambda -
            coalesce(col("max_sim"), lit(0.0)) * (1.0 - lambda)).as("score"))
      val pick = scored
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("query_id"), lit(r).as("sel_rank"), col("cand_id"), col("score"))
      // localCheckpoint TRUNCATES the lineage each round: round r
      // references `selected` three times (max-sim join, anti-join,
      // union), so an unbroken plan grows ~3^r nodes and the
      // optimizer, not the data, becomes the bottleneck (measured: 8
      // rounds never finished planning). The checkpointed frame is
      // rounds·|Q| rows — trivially small; values are computed once,
      // so determinism is untouched.
      selected = graft.ops.Lineage.cut(selected.unionByName(pick), chain)
      r += 1
    }
    selected
    } finally graft.ops.Lineage.endChain(cands.sparkSession, chain, deleteLast = false)
  }
}

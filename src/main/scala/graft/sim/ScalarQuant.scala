package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** SQ8 scalar quantization for embedding columns — the simplest member
  * of the compressed-serving family (SQ8 here, PQ/IVF-PQ in
  * [[PqIndex]]): every float32 component becomes one signed byte
  * `round(x · 127 / max_abs)`, a 4× storage cut with near-lossless
  * ranking, and — unlike PQ's codebook — NO fitted state beyond one
  * scalar, so append never drifts and re-quantization is a broadcast.
  *
  * Ranking then happens ENTIRELY in integer arithmetic: the score of a
  * (query, corpus) pair is the int dot product of their codes — exact,
  * order-independent, overflow-free (|code| ≤ 127 ⇒ a pair term ≤
  * 16 129; dim 64 ⇒ |score| < 2^21, summed in long). That makes SQ8
  * ranking bit-identical across engines and partitionings, where float
  * cosine needs the sequential-fold convention; ties break on vec_id.
  *
  * At 100 TB: `fitMaxAbs` is ONE scalar aggregate (map-side-combined
  * max, bytes to the driver); encoding is a narrow projection; the
  * scalar rides a 1-row broadcast (the BM25-stats pattern) — no
  * shuffle anywhere in the encode path. Search cost is the same
  * broadcast nested-loop as brute force but over 4×-smaller codes with
  * multiply-add on ints; cap the scanned corpus with the IVF cell
  * routing of [[VectorIndex]] exactly as [[PqIndex.searchAdcIvf]] does.
  *
  * Reference scope: the reference has no vector ops at all (539-line
  * pandas ETL under `dags/`) — this is driver-mandated extension
  * surface (SURVEY §2.11).
  */
object ScalarQuant {

  /** Corpus scale: max |component| over VALID vectors (one row, one
    * column `max_abs`). Max is order-independent — exact on any
    * partitioning, unlike a mean/std fit. Dirty vectors (NULL / wrong
    * dim / NaN / zero) are excluded by [[VectorFunctions.isValidVector]]
    * — one NaN component would poison the scale for the whole corpus
    * (NaN propagates through greatest on some engines; the adversarial
    * sweep's k-means NaN-centroid episode, generalized). */
  def fitMaxAbs(embs: DataFrame, dim: Int, embCol: String = "embedding"): DataFrame =
    embs.where(VectorFunctions.isValidVector(col(embCol), dim))
      .select(aggregate(col(embCol), lit(0.0),
        (acc, v) => greatest(acc, abs(v.cast(DoubleType)))).as("row_max"))
      .agg(max(col("row_max")).as("max_abs"))

  /** Encode one embedding to its SQ8 code array. `maxAbs` is a column
    * (normally from the broadcast 1-row [[fitMaxAbs]] frame) so the
    * plan stays a narrow projection. Components beyond ±max_abs (an
    * APPENDED vector larger than the fitted corpus ever was) saturate
    * at ±127 instead of silently overflowing the byte range —
    * re-fitting is only needed when saturation accounting says so. */
  def encode(emb: Column, maxAbs: Column): Column =
    transform(emb, x =>
      greatest(lit(-127), least(lit(127),
        round(x.cast(DoubleType) * lit(127.0) / maxAbs).cast(IntegerType))))

  /** Exact integer dot product of two code arrays (long to stay
    * overflow-free to dim 2^39). */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast(LongType)),
      lit(0L), (acc, v) => acc + v)

  /** Top-k SQ8 neighbors per query: fit → encode both sides → integer
    * dot scores → per-query top-k (ties on neighbor_id). The queries
    * frame is broadcast twice-removed (codes only); the corpus is
    * scanned once, narrow until the final top-k window. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame = {
    val scale = fitMaxAbs(corpus, dim)
    def codes(df: DataFrame, idAs: String, codeAs: String): DataFrame =
      df.where(VectorFunctions.isValidVector(col("embedding"), dim))
        .crossJoin(broadcast(scale))
        .select(col("vec_id").as(idAs),
          encode(col("embedding"), col("max_abs")).as(codeAs))
    // bruteForceTopK discipline: static cohort bound + loud overflow
    val q = broadcast(codes(PqIndex.boundedCohort(queries), "query_id", "q_code"))
    val scored = codes(corpus, "neighbor_id", "c_code")
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        intDot(col("q_code"), col("c_code")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}

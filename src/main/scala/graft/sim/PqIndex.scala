package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Product quantization (Jégou et al., PAMI'11) over an embedding
  * column — the COMPRESSION member of the ANN family next to
  * [[RandomHyperplaneLsh]] (bucketing) and [[IvfIndex]] (coarse
  * cells): split each `dim`-vector into `m` subspaces, quantize every
  * subvector to one of `ksub` per-subspace centroids, and keep only
  * the `m` code ids per vector — 64 floats (256 B) become 8 codes
  * (8 B), a 32× memory cut, which at 100 TB is the difference between
  * an index that fits executor memory and one that doesn't.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * un-quantized; per query ONE `m`×`ksub` table of subspace dot
  * products is precomputed (a narrow projection over the broadcast
  * query set), and each candidate's approximate score is `m` table
  * lookups — no per-pair float loops over the full vectors. On a real
  * deployment the exhaustive code scan is additionally gated by IVF
  * cells (IVF-PQ); the scan here is the oracled baseline, and the
  * shape composes with [[IvfIndex.assign]] unchanged.
  *
  * "Training" follows the [[IvfIndex]] convention: the subspace
  * codebooks are the subvectors of the first `ksub` corpus vectors
  * (by id) — deterministic, collected once (m·ksub·(dim/m) floats =
  * kilobytes on the driver, embedded as literals into the encode
  * expression), and reconstructible by the DuckDB oracle straight
  * from the embeddings table. A k-means fit on a sample slots in via
  * the `codebook` parameter without touching encode/search, exactly
  * like `IvfIndex.fit`.
  *
  * All float arithmetic is cast to double and folded left-to-right
  * (subspace terms in fixed j order), the engine-wide reproducibility
  * discipline (see [[VectorFunctions]]) that lets the oracle
  * hash-match scores bit-for-bit.
  */
class PqIndex(dim: Int, m: Int = 8, ksub: Int = 16) extends Serializable {
  require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
  private val sub = dim / m

  /** codebook(j)(c) = subvector j of corpus vector c (c < ksub). */
  def codebookOf(corpus: DataFrame): Array[Array[Array[Float]]] = {
    val seed = corpus.where(col("vec_id") < ksub)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(seed.length == ksub, s"corpus has fewer than $ksub seed vectors")
    Array.tabulate(m)(j => seed.map(_._2.slice(j * sub, (j + 1) * sub)))
  }

  /** Σ_t (x[j·sub+t] − cen[t])² in double, fixed t order. */
  private def subL2(emb: Column, j: Int, cen: Array[Float]): Column =
    (0 until sub).map { t =>
      val d = element_at(emb, j * sub + t + 1).cast(DoubleType) - lit(cen(t)).cast(DoubleType)
      d * d
    }.reduce(_ + _)

  /** Σ_t q[j·sub+t]·cen[t] in double, fixed t order. */
  private def subDot(emb: Column, j: Int, cen: Array[Float]): Column =
    (0 until sub).map { t =>
      element_at(emb, j * sub + t + 1).cast(DoubleType) * lit(cen(t)).cast(DoubleType)
    }.reduce(_ + _)

  /** Corpus → (vec_id, codes array<int>): per subspace the id of the
    * nearest (L2, ties → lowest id) codebook centroid. One narrow
    * projection per row through the native [[PqEncode]] expression —
    * the builtin argmin forest (m·ksub·sub ≈ 1 000 nodes) is past what
    * whole-stage codegen accepts and ran interpreted (see PqEncode
    * scaladoc; measured ~20× slower on this stage). */
  def encode(corpus: DataFrame, codebook: Array[Array[Array[Float]]]): DataFrame =
    corpus.select(col("vec_id"),
      org.apache.spark.sql.GraftSqlShim.column(PqEncode(
        org.apache.spark.sql.GraftSqlShim.expression(col("embedding")), codebook)).as("codes"))

  /** Builtin-forest twin of [[encode]] (least over (dist, id) structs —
    * structs are total-ordered, so least ≡ argmin with the lowest-id
    * tie-break). Value-identical to the native path (PqIndexSpec pins
    * them) and shaped like the DuckDB oracle CTE; kept as the
    * cross-check twin. */
  def encodeViaBuiltins(corpus: DataFrame, codebook: Array[Array[Array[Float]]]): DataFrame = {
    val codes = array((0 until m).map { j =>
      least((0 until ksub).map { c =>
        struct(subL2(col("embedding"), j, codebook(j)(c)).as("d"), lit(c).as("c"))
      }: _*).getField("c")
    }: _*)
    corpus.select(col("vec_id"), codes.as("codes"))
  }

  /** ADC top-k: each (query, candidate) score is the native
    * [[AdcScore]] reconstructed-centroid dot (see its scaladoc for why
    * the classic per-query lookup table LOSES inside a non-codegen
    * BroadcastNestedLoopJoin at this dim/m). The query side is
    * broadcast; the code scan streams — no shuffle of the corpus, and
    * the only exchange is the per-query top-k window over
    * |queries|·|corpus| scored (id, id, double) rows. */
  def searchAdc(corpusCodes: DataFrame, queries: DataFrame, k: Int,
                codebook: Array[Array[Array[Float]]]): DataFrame = {
    val q = broadcast(PqIndex.boundedCohort(queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val score = org.apache.spark.sql.GraftSqlShim.column(AdcScore(
      org.apache.spark.sql.GraftSqlShim.expression(col("q_emb")),
      org.apache.spark.sql.GraftSqlShim.expression(col("codes")), codebook))
    val scored = corpusCodes.crossJoin(q)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), score.as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Lookup-table ADC twin: per query the m×ksub table of subspace
    * dots is precomputed and each pair costs m element_at lookups —
    * the textbook shape, value-identical to [[searchAdc]] term for
    * term (PqIndexSpec pins them). */
  def searchAdcViaTables(corpusCodes: DataFrame, queries: DataFrame, k: Int,
                         codebook: Array[Array[Array[Float]]]): DataFrame = {
    val tables = array((0 until m).map { j =>
      array((0 until ksub).map(c => subDot(col("q_emb"), j, codebook(j)(c))): _*)
    }: _*)
    val q = broadcast(PqIndex.boundedCohort(queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .withColumn("tables", tables)
        .drop("q_emb"))
    val score = (0 until m).map { j =>
      element_at(element_at(col("tables"), j + 1), element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    val scored = corpusCodes.crossJoin(q)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), score.as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Convenience: codebook + encode + search in one call. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cb = codebookOf(corpus)
    searchAdc(encode(corpus, cb), queries, k, cb)
  }

  /** The production training path: per-subspace Lloyd's k-means from
    * the deterministic seed codebook — the PQ twin of [[IvfIndex.fit]].
    * Each round is ONE narrow encode pass (the native [[PqEncode]]
    * expression with the current codebook as literals, zero shuffle)
    * plus one (subspace, code, dim) mean aggregation — a shuffle of one
    * row per (vector, dim) that map-side combines down to m·ksub·sub
    * rows (kilobytes on the driver). Codes that lose all members keep
    * their previous centroid, the standard empty-cell rule. At 100 TB
    * you fit on `corpus.sample(...)` — encode/search are unchanged, the
    * same slot-in contract IvfIndex.fit documents. (Mean aggregation is
    * fp-order-dependent, so a fitted codebook is not bit-portable
    * across engines — the oracled q78/q84 use the deterministic seed
    * codebook; this method is spec-tested for behavior instead.) */
  def fit(corpus: DataFrame, iters: Int = 3): Array[Array[Array[Float]]] = {
    var cb = codebookOf(corpus)
    var it = 0
    while (it < iters) {
      val means = corpus.select(col("embedding"),
          org.apache.spark.sql.GraftSqlShim.column(PqEncode(
            org.apache.spark.sql.GraftSqlShim.expression(col("embedding")), cb)).as("codes"))
        .select(col("embedding"), posexplode(col("codes")).as(Seq("j", "code")))
        .select(col("j"), col("code"),
          posexplode(slice(col("embedding"), col("j") * lit(sub) + lit(1), lit(sub)))
            .as(Seq("pos", "x")))
        .groupBy("j", "code", "pos")
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = cb.map(_.map(_.clone))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
      }
      cb = next
      it += 1
    }
    cb
  }

  /** IVF-PQ composed search — the production ANN shape this class's
    * scaladoc promises: the exhaustive ADC code scan is gated by IVF
    * cells, so each query scores only the codes in its `ivf.nProbe`
    * nearest cells instead of the whole corpus. `cellCodes` carries
    * (vec_id, cell, codes) — [[IvfIndex.assignWith]] composed with
    * [[encode]]; at scale it is the standing cell-partitioned table
    * ([[VectorIndex]] layout with codes instead of raw vectors, 32×
    * smaller). The probe join is the only exchange: broadcast of the
    * exploded query probes, corpus side streams in place. */
  def searchAdcIvf(cellCodes: DataFrame, queries: DataFrame, k: Int,
                   codebook: Array[Array[Array[Float]]],
                   ivf: IvfIndex, cents: Array[(Int, Array[Float])]): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("__probe", explode(slice(ivf.sortedCells(col("q_emb"), cents), 1, ivf.nProbe)))
      .withColumn("cell", col("__probe").getField("cell"))
      .drop("__probe")
    val score = org.apache.spark.sql.GraftSqlShim.column(AdcScore(
      org.apache.spark.sql.GraftSqlShim.expression(col("q_emb")),
      org.apache.spark.sql.GraftSqlShim.expression(col("codes")), codebook))
    // (query, neighbor) is unique by construction — assignWith keeps
    // ONE cell per corpus vector — so no dedup shuffle precedes the
    // top-k window (same argument as IvfIndex.searchAssigned)
    val scored = cellCodes.join(broadcast(q), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), score.as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Convenience IVF-PQ: deterministic seed quantizer + seed codebook,
    * assign + encode + cell-gated ADC search. */
  def annTopKIvf(corpus: DataFrame, queries: DataFrame, k: Int, ivf: IvfIndex): DataFrame = {
    val cb = codebookOf(corpus)
    val cents = ivf.centroidsOf(corpus)
    val cellCodes = ivf.assignWith(corpus, cents).select(col("vec_id"), col("cell"),
      org.apache.spark.sql.GraftSqlShim.column(PqEncode(
        org.apache.spark.sql.GraftSqlShim.expression(col("embedding")), cb)).as("codes"))
    searchAdcIvf(cellCodes, queries, k, cb, ivf, cents)
  }
}

object PqIndex {
  /** Bounded evaluation cohort for the brute ADC scans — the
    * bruteForceTopK discipline shared by [[PqIndex.searchAdc]] /
    * [[PqIndex.searchAdcViaTables]] / [[ScalarQuant.annTopK]]: the
    * plan-level limit makes the broadcast side's row count STATIC
    * (planLint's bounded-build proof) and the `cap + 1` probe fails
    * LOUDLY if a caller hands a cohort the limit would otherwise
    * silently truncate. Large panels belong on the cell-gated paths
    * (annTopKIvf / VectorIndex). */
  private[sim] def boundedCohort(queries: org.apache.spark.sql.DataFrame,
                                 cap: Int = 4096): org.apache.spark.sql.DataFrame = {
    val n = queries.limit(cap + 1).count()
    require(n <= cap,
      s"query cohort exceeds $cap rows: the brute ADC scan would silently " +
        "truncate; use the IVF-gated search for large panels")
    queries.limit(cap)
  }
}

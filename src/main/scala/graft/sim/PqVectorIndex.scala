package graft.sim

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A STANDING IVF-PQ index on disk — the serving shape of
  * [[PqIndex.searchAdcIvf]]: the corpus is stored as PQ CODES
  * (m bytes-ish per vector instead of dim floats — 32× smaller at
  * m=8/dim=64), partitioned by IVF cell, next to (cell, centroid) and
  * (j, c, centroid) side tables that make the index self-contained.
  *
  * This composes the two standing-index ideas already in the engine:
  * [[VectorIndex]]'s cell partitioning (probe join prunes cells via
  * dynamic partition pruning, so a query batch reads nProbe/nCells of
  * the corpus) and [[PqIndex]]'s compression (what IS read is codes,
  * not vectors — at 100 TB of raw embeddings the code table is ~3 TB,
  * the difference between an index that fits hot storage and one that
  * doesn't). Assignment AND encoding cost is paid once at write time;
  * a probe pays only the broadcast of its exploded query probes and
  * the ADC scan of the pruned cells.
  *
  * Appending newly embedded vectors is a partitioned append with the
  * SAME quantizer and codebook — standing cells are not rewritten.
  */
object PqVectorIndex {

  private def cellsDir(dir: String) = s"$dir/cells"
  private def centroidsDir(dir: String) = s"$dir/centroids"
  private def codebookDir(dir: String) = s"$dir/codebook"

  /** Materialize (or replace) the index: one narrow assign+encode pass
    * over the corpus (both the argmax cell and the PQ codes are
    * per-row projections), written partitioned by cell. */
  def write(corpus: DataFrame, dir: String, ivf: IvfIndex,
            cents: Array[(Int, Array[Float])], pq: PqIndex,
            codebook: Array[Array[Array[Float]]],
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = corpus.sparkSession
    if (mode == SaveMode.Overwrite)
      VectorIndex.clearRetracted(spark, dir) // rebuild clears takedowns
    ivf.assignWith(corpus, cents)
      .select(col("vec_id"), col("cell"),
        org.apache.spark.sql.GraftSqlShim.column(PqEncode(
          org.apache.spark.sql.GraftSqlShim.expression(col("embedding")), codebook)).as("codes"))
      .write.mode(mode).partitionBy("cell").parquet(cellsDir(dir))
    import spark.implicits._
    cents.toSeq.toDF("cell", "centroid")
      .write.mode(mode).parquet(centroidsDir(dir))
    codebook.zipWithIndex.flatMap { case (subs, j) =>
      subs.zipWithIndex.map { case (cen, c) => (j, c, cen.toSeq) }
    }.toSeq.toDF("j", "c", "centroid")
      .write.mode(mode).parquet(codebookDir(dir))
  }

  /** Add vectors encoded with the index's OWN standing quantizer and
    * codebook (both read from the side tables — a caller-supplied
    * PqIndex could silently disagree with the on-disk codebook, so
    * there is deliberately no such parameter) — partitioned append,
    * standing cells untouched. */
  def append(corpus: DataFrame, dir: String, ivf: IvfIndex): Unit = {
    val spark = corpus.sparkSession
    val cents = readCentroids(spark, dir)
    val cb = readCodebook(spark, dir)
    ivf.assignWith(corpus, cents)
      .select(col("vec_id"), col("cell"),
        org.apache.spark.sql.GraftSqlShim.column(PqEncode(
          org.apache.spark.sql.GraftSqlShim.expression(col("embedding")), cb)).as("codes"))
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(cellsDir(dir))
  }

  /** Same (cell, centroid) side-table layout as [[VectorIndex]] — one
    * read path, deliberately shared. */
  def readCentroids(spark: SparkSession, dir: String): Array[(Int, Array[Float])] =
    VectorIndex.readCentroids(spark, dir)

  // ------------------------------------------------------------------
  // retraction (takedown without rebuild) — fifth standing-index family
  // ------------------------------------------------------------------

  /** REMOVE vectors from the standing index without a rebuild —
    * [[VectorIndex.retract]]'s pattern transferred to the PQ codes
    * layout (codes are per-vector rows, so retraction is FULLY exact).
    * One deliberate difference: the caller names vec_ids, NOT vectors —
    * the index stores only 1-byte/sub-vector codes, a takedown
    * typically no longer has the raw embedding, and recomputing the
    * cell from caller-supplied vectors is exactly the stale-assignment
    * resurface hazard ADVICE r14 #2 called out on VectorIndex. The
    * tombstone therefore carries ids only; [[reclaim]] derives the
    * affected cells from the index itself. Until reclamation, [[topK]]
    * anti-joins the (small, broadcast) id list out of the pruned ADC
    * scan — zero cost before the first retraction (no tombstone dir →
    * pass-through, PqVectorIndexSpec's plan pins unchanged).
    * Crash-replay idempotent: duplicate tombstone rows distinct away. */
  def retract(spark: SparkSession, dir: String, vecIds: DataFrame): Unit =
    vecIds.select(col("vec_id")).distinct()
      .write.mode(SaveMode.Append).parquet(VectorIndex.retractedDir(dir))

  private def notRetracted(spark: SparkSession, dir: String,
                           cells: DataFrame): DataFrame =
    if (!VectorIndex.pathExists(spark, VectorIndex.retractedDir(dir))) cells
    else cells.join(
      graft.ops.Hints.guardedBroadcast(
        spark.read.parquet(VectorIndex.retractedDir(dir))
          .select("vec_id").distinct()),
      Seq("vec_id"), "left_anti")

  /** Physically drop retracted code rows — affected cells derived from
    * the index (one narrow (vec_id, cell) scan, ground truth by
    * construction), each rewritten without the ids via dynamic
    * partition overwrite, emptied cells deleted, tombstones cleared
    * last. Identical mechanics to [[VectorIndex.reclaim]]; the code
    * payload is never decoded. */
  def reclaim(spark: SparkSession, dir: String): Unit =
    VectorIndex.reclaim(spark, dir)

  /** Lifecycle: rewrite each cell partition's accumulated small CODE
    * files to ~target size; layout and probe plan unchanged. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): graft.ops.Maintenance.CompactionStats =
    graft.ops.Maintenance.compactPartitioned(spark, cellsDir(dir), targetBytes)

  /** Refit the IVF quantizer AND the PQ codebook on the CURRENT corpus
    * and rewrite the index — the repair for quantizer drift: appends
    * encode with the codebook fitted on the ORIGINAL distribution, so
    * as the corpus shifts, cells unbalance and codes stop separating
    * neighbors. Needs the raw vectors (the index stores only 1-byte/
    * sub-vector codes — by design; that's the 32× serving compression),
    * so the caller hands back the corpus the index should cover. */
  def refreshCodebook(corpus: DataFrame, dir: String, ivf: IvfIndex,
                      pq: PqIndex, iters: Int = 3): Unit = {
    val cents = ivf.fit(corpus, iters)
    val cb = pq.fit(corpus, iters)
    write(corpus, dir, ivf, cents, pq, cb, SaveMode.Overwrite)
  }

  case class RefreshDecision(recallBefore: Double, refreshed: Boolean,
                             recallAfter: Double)

  /** The q94 production loop as an operator: measure recall@k of the
    * standing index against brute-force ground truth on a query SAMPLE
    * (never the full corpus — the exact arm costs |sample|·|corpus|
    * scored rows), refresh the codebook only when it drifted below
    * `minRecall`, and re-measure. Driver traffic is two scalar counts.
    */
  def refreshIfDrifted(corpus: DataFrame, queries: DataFrame, dir: String,
                       k: Int, ivf: IvfIndex, pq: PqIndex,
                       minRecall: Double = 0.8, iters: Int = 3): RefreshDecision = {
    val spark = corpus.sparkSession
    def recall(): Double = {
      val exact = VectorFunctions.bruteForceTopK(corpus, queries, k)
        .select(col("query_id"), col("neighbor_id"))
      val approx = topK(spark, dir, queries, k, ivf, pq)
        .select(col("query_id"), col("neighbor_id"))
      val denom = exact.count()
      if (denom == 0) 1.0
      else approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / denom
    }
    val before = recall()
    if (before >= minRecall) RefreshDecision(before, refreshed = false, before)
    else {
      refreshCodebook(corpus, dir, ivf, pq, iters)
      RefreshDecision(before, refreshed = true, recall())
    }
  }

  def readCodebook(spark: SparkSession, dir: String): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(codebookDir(dir))
      .select(col("j").cast("int"), col("c").cast("int"), col("centroid"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray))
      .toMap
    val m = rows.keys.map(_._1).max + 1
    val ksub = rows.keys.map(_._2).max + 1
    Array.tabulate(m, ksub)((j, c) => rows((j, c)))
  }

  /** Cell-gated ADC top-k against the standing index — identical
    * contract to [[PqIndex.annTopKIvf]], but the code table is the
    * partitioned parquet and the probe join dynamically prunes its
    * cell partitions. */
  def topK(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
           ivf: IvfIndex, pq: PqIndex): DataFrame = {
    val cents = readCentroids(spark, dir)
    val cb = readCodebook(spark, dir)
    pq.searchAdcIvf(notRetracted(spark, dir, spark.read.parquet(cellsDir(dir))),
      queries, k, cb, ivf, cents)
  }
}

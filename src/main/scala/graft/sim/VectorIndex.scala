package graft.sim

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A STANDING IVF vector index on disk — the serving shape of
  * [[IvfIndex]]: the corpus is materialized once, partitioned by its
  * nearest-centroid cell, next to a (cell, centroid) side table that
  * makes the index self-contained.
  *
  * The probe join (cell-partitioned corpus ⨝ broadcast query probes)
  * then prunes corpus partitions at RUNTIME via dynamic partition
  * pruning: only the nProbe cells any query asked for are read. At
  * 100 TB that is the difference between scanning nProbe/nCells of
  * the corpus and scanning all of it on every query batch — and the
  * assignment cost (the nCells cosines per corpus row) is paid once
  * at write time, not per query.
  *
  * Appending newly embedded vectors is a partitioned append: new files
  * land inside their cell directories; standing data is not rewritten.
  */
object VectorIndex {

  private def cellsDir(dir: String) = s"$dir/cells"
  private def centroidsDir(dir: String) = s"$dir/centroids"

  /** Materialize (or replace) the index: assign every corpus vector to
    * its cell (one narrow literal-centroid projection — see
    * [[IvfIndex.assignWith]]) and write partitioned by cell. */
  def write(corpus: DataFrame, dir: String, index: IvfIndex,
            cents: Array[(Int, Array[Float])],
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = corpus.sparkSession
    index.assignWith(corpus, cents)
      .write.mode(mode).partitionBy("cell").parquet(cellsDir(dir))
    import spark.implicits._
    cents.toSeq.toDF("cell", "centroid")
      .write.mode(mode).parquet(centroidsDir(dir))
  }

  /** Add vectors to a standing index (same quantizer!) — partitioned
    * append, no rewrite of standing cells. */
  def append(corpus: DataFrame, dir: String, index: IvfIndex): Unit = {
    val cents = readCentroids(corpus.sparkSession, dir)
    index.assignWith(corpus, cents)
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(cellsDir(dir))
  }

  /** Lifecycle: after N appends each cell holds N small files; rewrite
    * every cell partition to ~target-sized files. The layout (and so
    * the probe plan, incl. dynamic partition pruning) is unchanged —
    * IndexLifecycleSpec pins plan + results pre/post. Run in the
    * index's maintenance window (single writer, no concurrent reads
    * during a leaf swap). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): graft.ops.Maintenance.CompactionStats =
    graft.ops.Maintenance.compactPartitioned(spark, cellsDir(dir), targetBytes)

  /** The fitted quantizer back off disk — kilobytes, driver-side. */
  def readCentroids(spark: SparkSession, dir: String): Array[(Int, Array[Float])] =
    spark.read.parquet(centroidsDir(dir))
      .select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Top-k ANN against the standing index — identical contract to
    * [[IvfIndex.annTopK]], but the corpus side is the partitioned
    * table and the probe join dynamically prunes its cells. */
  def topK(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
           index: IvfIndex): DataFrame = {
    val cents = readCentroids(spark, dir)
    val cells = spark.read.parquet(cellsDir(dir))
    index.searchAssigned(cells, queries, k, cents)
  }
}

package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance — the janitorial operators every long-lived
  * 100 TB dataset needs and no query surface provides.
  *
  * Streaming sinks, incremental appends, and per-batch jobs strew
  * small files; a scan of 10M 100 KB files spends its time in task
  * scheduling and footer reads, not IO. Compaction rewrites a
  * directory to ~target-sized files and swaps it in place.
  */
object Maintenance {

  case class CompactionStats(filesBefore: Int, filesAfter: Int,
                             bytes: Long, rows: Long)

  /** Range-cluster a table on `cols` at write time: repartitionByRange
    * + sortWithinPartitions, so each parquet row group covers a narrow
    * min/max span of the cluster columns and the vectorized reader
    * SKIPS row groups whose stats exclude a pushed filter. The write
    * costs one range shuffle; every later selective scan reads a
    * fraction of the data — the poor man's z-order, and the right
    * layout for any column queried with equality/range predicates.
    * `rowGroupBytes` sizes the skipping granule (default 128 MB). */
  def writeClustered(df: org.apache.spark.sql.DataFrame, dir: String,
                     cols: Seq[String],
                     rowGroupBytes: Long = 128L << 20): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.option("parquet.block.size", rowGroupBytes.toString)
      .mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Rewrite `dir`'s parquet to ⌈bytes / targetBytes⌉ files and swap
    * atomically-ish (write beside, rename away, rename in, drop old —
    * a crash between renames leaves either the old or the new
    * directory complete under `dir` or `dir.old`, never a mix).
    * Single-writer per directory, like all maintenance. */
  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L << 20): CompactionStats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = listDataFiles(fs, path)
    // a flat rewrite of a partitioned/nested layout would destroy the
    // directory structure (and any per-batch commit markers) — compact
    // each leaf directory instead
    require(dataFiles.forall(_.getPath.getParent == fs.makeQualified(path)),
      s"$dir holds parquet files in subdirectories (partitioned layout); " +
        "compact each leaf directory, not the root")
    val bytes = dataFiles.map(_.getLen).sum
    val nParts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(dir)
    val tmp = new Path(dir + ".compact")
    val old = new Path(dir + ".old")
    // a stale .old from a crashed run would make the first rename fail
    // (local fs) or nest the live dir inside it (HDFS) — clear it
    fs.delete(old, true)
    df.repartition(nParts).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // row count from the rewrite's own footers — no extra data pass
    val rows = parquetRowCount(spark, fs, tmp)

    require(fs.rename(path, old), s"swap failed: could not move $path aside")
    require(fs.rename(tmp, path), s"swap failed: could not move $tmp into place")
    fs.delete(old, true)

    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    CompactionStats(dataFiles.length, after, bytes, rows)
  }

  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                            path: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f
    }
    out.result()
  }

  /** Total row count from parquet footers (metadata only, no data IO). */
  private def parquetRowCount(spark: SparkSession,
                              fs: org.apache.hadoop.fs.FileSystem,
                              dir: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    listDataFiles(fs, dir).map { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromStatus(f, spark.sparkContext.hadoopConfiguration))
      try r.getRecordCount finally r.close()
    }.sum
  }
}

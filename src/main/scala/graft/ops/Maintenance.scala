package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Z-value of two non-negative columns: interleave the low `bits`
    * bits (a→even positions, b→odd). Sorting by the z-value clusters
    * rows so BOTH columns' values are locally dense — each parquet row
    * group covers a small square of the (a, b) plane instead of a thin
    * stripe, so min/max skipping works for predicates on EITHER column
    * ([[writeClustered]] on one column only ever helps that column).
    * Pure builtin bit arithmetic (2·bits shift/and/or terms) — stays
    * inside whole-stage codegen, and DuckDB replays it exactly.
    *
    * Inputs must already lie in [0, 2^bits): fold keys with pmod, or
    * rank/scale real-valued columns first (the classic z-order
    * preparation). bits ≤ 31 keeps the z-value in a positive long. */
  def zValue2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
              bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    import org.apache.spark.sql.functions.{lit, shiftleft}
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** [[writeClustered]] with a z-order key: range-partition + sort by
    * the interleaved z-value of two query columns, so selective scans
    * on either (or both) skip most row groups. The write cost is one
    * tiny min/max aggregate plus the same single range shuffle as a
    * one-column clustering.
    *
    * Both columns are min/max-scaled to the SAME `bits`-wide range
    * before interleaving — unscaled columns of different magnitudes
    * break z-locality because the wider column's high bits dominate
    * the z prefix and the sort degenerates to a one-column clustering
    * (measured on lineitem: suppkey skipping 34% unscaled vs >50%
    * scaled). Equal-width interleave is the z-order contract. */
  def writeZOrdered(df: org.apache.spark.sql.DataFrame, dir: String,
                    colA: String, colB: String, bits: Int = 16,
                    rowGroupBytes: Long = 128L << 20): Unit = {
    import org.apache.spark.sql.functions.{col, least, lit, max, min}
    val r = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
                   min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val hi = (1L << bits) - 1
    // empty input (or all-null column): min/max come back null — there
    // is nothing to cluster, degrade to constant scale instead of NPE
    def bound(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    def scale(c: String, lo: Double, up: Double) =
      if (up > lo)
        least(lit(hi), ((col(c).cast("double") - lit(lo)) * lit(hi / (up - lo))).cast("long"))
      else lit(0L)
    val z = zValue2(scale(colA, bound(0), bound(1)),
                    scale(colB, bound(2), bound(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
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

  /** Compact every LEAF partition directory of a `partitionBy` layout
    * (e.g. a standing vector index's `cells/cell=N/`) — the per-leaf
    * twin of [[compactParquet]], preserving the partition structure
    * that dynamic partition pruning depends on. Same single-writer
    * contract; during a leaf's swap window a transient `<leaf>.compact`
    * sibling exists, so run it in the index's maintenance window, not
    * under concurrent readers. */
  def compactPartitioned(spark: SparkSession, dir: String,
                         targetBytes: Long = 128L << 20): CompactionStats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaves = fs.listStatus(path).filter(_.isDirectory).map(_.getPath)
      .filterNot(p => p.getName.endsWith(".compact") || p.getName.endsWith(".old"))
    require(leaves.nonEmpty, s"$dir has no partition subdirectories")
    val stats = leaves.map(l => compactParquet(spark, l.toString, targetBytes))
    CompactionStats(stats.map(_.filesBefore).sum, stats.map(_.filesAfter).sum,
      stats.map(_.bytes).sum, stats.map(_.rows).sum)
  }

  final case class MergeStats(touched: Seq[String], rewritten: Seq[String],
                              removed: Seq[String], rowsWritten: Long)

  /** Copy-on-write MERGE into a `partitionBy(partCol)` parquet layout:
    * apply a changelog ([[RelationalOps.mergeUpsert]] semantics —
    * last-version-wins upserts + deletes) rewriting ONLY the partitions
    * the changes touch. Untouched partition directories are never read,
    * never rewritten — their files stay byte-identical (spec-pinned) —
    * so a 100 TB date-partitioned table absorbs a daily changelog at
    * the cost of the touched days, not a full rewrite. This is the
    * table-format-free core of what a Delta/Iceberg MERGE does; without
    * a transaction log the atomicity unit is the PARTITION (leaf swap
    * by rename), so a crash mid-merge leaves each touched partition
    * either fully old or fully new, never mixed. Single writer, like
    * all maintenance here.
    *
    * Preconditions: `partCol` must be functionally dependent on `key`
    * (a change cannot MOVE a key across partitions — model that as a
    * 'D' in the old partition plus a 'U' in the new one, which this
    * handles naturally since both partitions are then touched); null
    * partition values are rejected.
    *
    * The touched-partition list is the one driver-side collect — gated
    * by `maxTouched` (a changelog touching more partitions than that
    * is a full rewrite wearing a costume; do that explicitly instead).
    */
  def mergePartitioned(spark: SparkSession, dir: String, changes: DataFrame,
                       partCol: String, key: String,
                       versionCol: String = "version", opCol: String = "op",
                       maxTouched: Int = 10000): MergeStats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touchedVals = changes.select(col(partCol)).distinct()
      .limit(maxTouched + 1).collect().map(_.get(0)).toSeq
    require(touchedVals.length <= maxTouched,
      s"changelog touches > $maxTouched partitions — run a full rewrite instead")
    require(!touchedVals.contains(null), "null partition values unsupported")

    // pruned scan: native-typed isin keeps partition pruning intact
    val base = spark.read.parquet(dir).where(col(partCol).isin(touchedVals: _*))
    val merged = graft.ops.RelationalOps.mergeUpsert(base, changes, key, versionCol, opCol)

    // stage the touched partitions beside the table, then swap leaves
    val tmp = new Path(dir + ".merge")
    fs.delete(tmp, true)
    merged.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(tmp.toString)
    val rows = parquetRowCount(spark, fs, tmp)

    val newLeaves = fs.listStatus(tmp).filter(_.isDirectory).map(_.getPath.getName)
    newLeaves.foreach { leaf =>
      val dest = new Path(path, leaf)
      fs.delete(dest, true)
      require(fs.rename(new Path(tmp, leaf), dest), s"leaf swap failed for $leaf")
    }
    // touched partitions with NO surviving rows produce no staged leaf:
    // every key was deleted — drop the stale directory
    val survivingVals = newLeaves.map(n =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(n.substring(n.indexOf('=') + 1))).toSet
    val removed = touchedVals.map(_.toString).filterNot(survivingVals.contains)
      .filter { v =>
        val leaf = new Path(path, s"$partCol=" +
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v))
        fs.exists(leaf) && fs.delete(leaf, true)
      }
    fs.delete(tmp, true)
    MergeStats(touchedVals.map(_.toString), newLeaves.toSeq.sorted, removed, rows)
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

package graft.dedup

import graft.ops.TrackedCache.TrackOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A STANDING MinHash signature index, materialized as bucketed tables —
  * the 100 TB shape of incremental near-dup dedup.
  *
  * [[Dedup.dedupIncrementalSigs]] takes the corpus signatures as a
  * DataFrame and re-shuffles them on every probe; that is fine when the
  * corpus is re-derived per run, but a production corpus index is
  * maintained ONCE and probed by every arriving batch. This object
  * materializes the index as two bucketed+sorted tables:
  *
  *   - `{name}_banded` (doc_id, band, bh), bucketed by (band, bh) —
  *     the LSH buckets. A probe's candidate join and the bucket-size
  *     skew cap both hash-partition by (band, bh), so neither ever
  *     exchanges the corpus side: only the (small) arriving batch
  *     shuffles, into the index's bucketing.
  *   - `{name}_sigs` (doc_id, sig), bucketed by doc_id — the
  *     verification side table; attaching the corpus signature to a
  *     candidate pair shuffles only the pair ids.
  *
  * At 100 TB the corpus >> batch, so "never shuffle the corpus" is the
  * difference between probe cost proportional to the BATCH and probe
  * cost proportional to the CORPUS. Appending a deduplicated batch back
  * into the index is a bucketed append — no rewrite of standing data.
  */
object SignatureIndex {

  /** Banding layout + physical bucket count of the index tables. The
    * same `bands`/`rowsPerBand` MUST be used by writers and probes. */
  case class Spec(bands: Int = 8, rowsPerBand: Int = 4, buckets: Int = 64)

  private def bandedName(name: String) = s"${name}_banded"
  private def sigsName(name: String) = s"${name}_sigs"
  private def retractedName(name: String) = s"${name}_retracted"

  /** A REPLACE must also clear a previous SESSION's leftovers: the
    * managed-table directory under the warehouse survives the
    * in-memory catalog, and `saveAsTable(Overwrite)` on a name the
    * catalog doesn't know refuses to reuse the existing location
    * (LOCATION_ALREADY_EXISTS). Same single-writer contract as
    * [[graft.ref.Checkpoints]]: one writer per index name at a time. */
  private[graft] def dropStale(spark: SparkSession, table: String): Unit = {
    // Resolve the REAL location from the catalog while the table still
    // exists — deriving `<warehouse>/<table>` by hand is wrong under a
    // non-default current database (`<warehouse>/<db>.db/<table>`) or
    // a Hive/external catalog, where the guess would leave stale data
    // alive (or delete an unrelated same-named path).
    val known: Option[(Path, Boolean)] =
      if (spark.catalog.tableExists(table)) {
        val meta = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table))
        Some((new Path(meta.location),
          meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL))
      } else None
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    known match {
      case Some((_, true)) => // EXTERNAL: the data is not ours to delete
      case Some((loc, false)) =>
        // managed: DROP removes the data too; sweep defensively in
        // case a failed earlier drop left files behind
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      case None =>
        // orphaned-directory case: a previous SESSION's managed dir
        // the in-memory catalog no longer knows. Managed tables live
        // under the CURRENT database's location (default db =
        // warehouse root), so resolve via the catalog, not the conf.
        val dbUri = spark.catalog.getDatabase(spark.catalog.currentDatabase).locationUri
        val loc = new Path(new Path(dbUri), table.toLowerCase)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  /** Materialize (or replace) the index from a signature table
    * (doc_id, sig) — one bucketed write per index table. */
  def write(sigs: DataFrame, name: String, spec: Spec = Spec(),
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      dropStale(sigs.sparkSession, bandedName(name))
      dropStale(sigs.sparkSession, sigsName(name))
      dropStale(sigs.sparkSession, retractedName(name)) // rebuild clears takedowns
    }
    Dedup.bandedOf(sigs, spec.bands, spec.rowsPerBand)
      .write.mode(mode)
      .bucketBy(spec.buckets, "band", "bh").sortBy("band", "bh")
      .saveAsTable(bandedName(name))
    sigs.write.mode(mode)
      .bucketBy(spec.buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(sigsName(name))
  }

  /** Add new documents' signatures to a standing index — the write a
    * pipeline issues after keeping a batch's survivors. Bucketed
    * append: new files land in the existing bucket layout; standing
    * data is not rewritten. */
  def append(sigs: DataFrame, name: String, spec: Spec = Spec()): Unit =
    write(sigs, name, spec, SaveMode.Append)

  // ------------------------------------------------------------------
  // retraction (takedown without rebuild)
  // ------------------------------------------------------------------

  /** REMOVE documents from the standing index without a rebuild — the
    * takedown path. Unlike the gram index (stats-grain rows, owner
    * unrepairable), signature rows are PER-DOCUMENT, so retraction
    * here is FULLY exact for every operation: [[retract]] appends the
    * ids to a side table, every reader anti-joins them out BEFORE the
    * bucket-size census (so skew caps and star anchors are decided on
    * the post-takedown corpus, exactly as a rebuild would), and
    * [[compact]] physically drops the rows and clears the side table —
    * complete reclamation, not just masking. Cost: O(retracted ids)
    * per retract; a broadcast anti-join per read (the ids are the
    * takedown list — small; [[graft.ops.Hints.guardedBroadcast]]
    * degrades gracefully if not); zero until the first retraction
    * (the side table doesn't exist, readers pass through untouched).
    * Retraction is idempotent: the reader distincts the id list, so a
    * crash-replayed retract of the same ids changes nothing. */
  def retract(spark: SparkSession, name: String, docIds: DataFrame): Unit =
    docIds.select(col("doc_id").cast("long"))
      .write.mode(SaveMode.Append).saveAsTable(retractedName(name))

  /** Anti-join a reader's index-side rows against the retracted-id
    * table; pass-through when no retraction ever happened. */
  private def notRetracted(spark: SparkSession, name: String,
                           df: DataFrame): DataFrame =
    if (!spark.catalog.tableExists(retractedName(name))) df
    else df.join(
      graft.ops.Hints.guardedBroadcast(
        spark.table(retractedName(name)).select("doc_id").distinct()),
      Seq("doc_id"), "left_anti")

  /** Lifecycle: every [[append]] adds one file per (task × touched
    * bucket), so a long-lived index accretes small files per bucket.
    * Rewrite both tables with the SAME bucketing spec — repartitioned
    * on the bucket columns first, so each task holds exactly one
    * bucket and writes exactly one file — into a sibling table, then
    * swap by catalog rename. The probe plan is unchanged: still
    * bucketed scans, still no corpus-side exchange
    * (IndexLifecycleSpec pins plan + results pre/post compact).
    * Single writer, like all maintenance. `spec` must match the spec
    * the index was written with (same contract as [[probe]]). */
  def compact(spark: SparkSession, name: String, spec: Spec = Spec()): Unit = {
    def rewrite(table: String, bucketCols: Seq[String]): Unit = {
      val tmp = s"${table}_compact"
      val old = s"${table}_old"
      dropStale(spark, tmp)
      dropStale(spark, old)
      // Read the FILES, not the bucketed table: a bucketed scan reports
      // HashPartitioning(bucketCols) so Catalyst elides the repartition
      // as redundant — and the writer then emits one file per (task ×
      // bucket) again. A plain parquet scan has unknown partitioning,
      // the shuffle is real, and repartition's HashPartitioning is the
      // same expression as the writer's bucket id — so task i holds
      // exactly bucket i and writes exactly ONE file per bucket.
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      // retracted rows are physically dropped here — compaction is the
      // full-reclamation point of the takedown path (the side table is
      // cleared after both rewrites; a crash between leaves a re-run
      // anti-joining ids that no longer match anything — idempotent)
      notRetracted(spark, name, spark.read.schema(spark.table(table).schema)
        .parquet(meta.location.toString))
        .repartition(spec.buckets, bucketCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(spec.buckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .saveAsTable(tmp)
      // Crash-safe swap (ADVICE r12 #3): rename the standing table ASIDE
      // first so no instant has zero recoverable copies — a crash between
      // the renames leaves `_old` AND `_compact` (both full data; recovery
      // = rename either back); a crash after the second rename leaves the
      // live table plus a stale `_old` the next compact's dropStale clears.
      spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
      spark.sql(s"DROP TABLE `$old`")
    }
    rewrite(bandedName(name), Seq("band", "bh"))
    rewrite(sigsName(name), Seq("doc_id"))
    dropStale(spark, retractedName(name))
  }

  /** Candidate near-dup pairs of an arriving batch AGAINST the index —
    * same contract as [[Dedup.minhashCandidatePairsBetween]] (doc_a ∈
    * batch, doc_b ∈ index, est_jaccard ≥ minEst), but the index side is
    * read in its bucketed layout: the skew cap aggregates and the
    * candidate join consume the index WITHOUT an exchange. */
  def probe(spark: SparkSession, batchSigsIn: DataFrame, name: String,
            spec: Spec = Spec(), minEst: Double = 0.5,
            bucketCap: Int = 1000): DataFrame = {
    val k = spec.bands * spec.rowsPerBand
    // the batch signatures feed banding AND the sig_a verification
    // attach (and the caller's anti-join in dedupAgainst) — persist,
    // or the batch MinHash computation re-executes per consumer
    // (same policy as minhashCandidatePairsBetween; unpersist falls
    // to the ContextCleaner)
    val batchSigs = batchSigsIn.persistT
    // retracted docs leave BEFORE the census: bucket sizes, caps and
    // anchors are decided on the post-takedown corpus, ≡ a rebuild
    val bb = notRetracted(spark, name, spark.table(bandedName(name)))
    // bucket-size skew cap: groupBy (band, bh) matches the table's
    // bucketing, so this aggregate plans with no exchange
    val sizedB = bb.groupBy("band", "bh")
      .agg(count(lit(1)).as("count"), min("doc_id").as("anchor"))
    val smallB = sizedB.where(col("count") <= bucketCap).select("band", "bh")
    val ba = Dedup.bandedOf(batchSigs, spec.bands, spec.rowsPerBand)
    // probe-shape pair dedup BEFORE verification (see
    // minhashCandidatePairsBetween: a true near-dup collides in most
    // bands, dedup first cuts the verification joins ~bands×)
    val within = ba.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
      .join(bb.join(smallB, Seq("band", "bh"))
        .select(col("band"), col("bh"), col("doc_id").as("doc_b")), Seq("band", "bh"))
      .select("doc_a", "doc_b")
    // over-cap index buckets: probe against the bucket-min anchor only
    // (O(|batch|) rows; the anchor stands for the near-identical bucket
    // through the est filter) — same star-pair policy as
    // minhashCandidatePairsBetween, never a silent drop
    val stars = ba.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
      .join(sizedB.where(col("count") > bucketCap)
        .select(col("band"), col("bh"), col("anchor").as("doc_b")), Seq("band", "bh"))
      .select("doc_a", "doc_b")
    val pairs = within.unionByName(stars).distinct()
    val withSigs = pairs
      .join(batchSigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(spark.table(sigsName(name))
        .select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
    val est = Dedup.sigAgreement(k)
    withSigs
      .select(col("doc_a"), col("doc_b"), est.as("est_jaccard"))
      .where(col("est_jaccard") >= minEst)
  }

  /** Candidate near-dup pairs WITHIN the standing index — the
    * shared-pipeline shape for every corpus-level dedup derivation
    * (duplicate graph, leak-free splits, duplicate direction, survivor
    * remap): derive signatures ONCE into the index, then let each
    * downstream analysis consume `selfPairs` instead of re-running
    * shingle → minhash → banding from raw text per query (the VERDICT
    * r8 shared-pipeline note — at 100 TB the signature pass over the
    * corpus is the dominant cost and must not be repeated five times).
    *
    * Semantics are EXACTLY [[Dedup.minhashCandidatePairs]] on the
    * signatures the index was built from — same skew cap, same
    * star-anchor policy for over-cap buckets, same adaptive pair-dedup
    * placement, same unrolled verification (SignatureIndexSpec pins
    * row-for-row equality) — but the banded scan arrives bucketed by
    * (band, bh), so the bucket-size aggregate and the bucket self-join
    * plan with NO exchange of the corpus: the only shuffles left are
    * the pair-verification joins, linear in |pairs|. */
  def selfPairs(spark: SparkSession, name: String, spec: Spec = Spec(),
                minEst: Double = 0.5, bucketCap: Int = 1000): DataFrame = {
    val k = spec.bands * spec.rowsPerBand
    // retraction filter first, census second (see probe); the sigs
    // lookups below need no filter — every doc id they see came
    // through this frame
    val banded = notRetracted(spark, name, spark.table(bandedName(name)))
    // matches the table's bucketing: aggregates without an exchange
    val sized = banded.groupBy("band", "bh")
      .agg(count(lit(1)).as("count"), min("doc_id").as("anchor"))
    val overCap = sized.where(col("count") > bucketCap)
      .select("band", "bh", "anchor").persistT
    val overCapB = graft.ops.Hints.guardedBroadcast(overCap)
    val safe = banded.join(overCapB.select("band", "bh"),
      Seq("band", "bh"), "left_anti")
    val dedupFirst = minEst >= 0.8
    val rawPairs = safe.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
      .join(safe.select(col("band"), col("bh"), col("doc_id").as("doc_b")),
        Seq("band", "bh"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val stars = banded.join(overCapB, Seq("band", "bh"))
      .where(col("doc_id") =!= col("anchor"))
      .select(col("anchor").as("doc_a"), col("doc_id").as("doc_b"))
    val rawCands = rawPairs.unionByName(stars)
    val pairs = if (dedupFirst) rawCands.distinct() else rawCands
    val sigs = spark.table(sigsName(name))
    val withSigs = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
    val est = Dedup.sigAgreement(k)
    val verified = withSigs
      .select(col("doc_a"), col("doc_b"), est.as("est_jaccard"))
      .where(col("est_jaccard") >= minEst)
    if (dedupFirst) verified else verified.dropDuplicates("doc_a", "doc_b")
  }

  /** End-to-end incremental dedup against a standing index: drop batch
    * docs near-duplicating the index, dedup the rest within the batch,
    * and return the survivors — [[Dedup.dedupIncrementalSigs]] with the
    * corpus side served from the bucketed index. Callers append the
    * survivors' signatures back via [[append]] to advance the index. */
  def dedupAgainst(spark: SparkSession, batch: DataFrame, batchSigs: DataFrame,
                   name: String, spec: Spec = Spec(), minEst: Double = 0.5,
                   bucketCap: Int = 1000): DataFrame = {
    val vsIndex = probe(spark, batchSigs, name, spec, minEst, bucketCap)
    val dupIds = vsIndex.select(col("doc_a").as("doc_id")).distinct().persistT
    val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti")
    val survivorSigs = batchSigs.join(dupIds, Seq("doc_id"), "left_anti")
    val within = Dedup.minhashCandidatePairs(
      survivorSigs, spec.bands, spec.rowsPerBand, minEst, bucketCap)
    Dedup.dedupByClusters(survivors, Dedup.nearDupClusters(within))
  }
}

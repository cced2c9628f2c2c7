package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TrackedCache.TrackOps
import graft.text.TextFunctions

/** A STANDING window-hash (gram) index — the 100 TB shape of repeated
  * exact-substring decontamination ([[Dedup.dupSpansAgainst]] re-grams
  * and re-shuffles the corpus on every probe; a production training set
  * is indexed ONCE and probed by every arriving shard).
  *
  * Layout: a size-tiered family of bucketed tables, all bucketed AND
  * sorted by gram —
  *   - the BASE `{name}_grams`, the bulk of the corpus;
  *   - zero or more DELTA segments `{name}_grams_d<a>_<b>`, one per
  *     append (a = b = the append's id) or per minor compaction (the
  *     merged id range [a, b]).
  * A probe hash-partitions only the (small) arriving shard into each
  * segment's bucket layout — the index side is consumed as stored with
  * NO exchange, so probe cost is proportional to the SHARD (times the
  * segment count, which [[compactDelta]] bounds), never the corpus.
  *
  * Row grain is (gram, source): `owner` is the minimum doc_id holding
  * the gram (within the row's source — readers min-merge across rows,
  * so the corpus-wide minimum always wins), the ownership seed for
  * incremental span SCRUBBING ([[scrubProbe]]); `n_docs` / `n_occ` are
  * the per-source document and occurrence counts that let the span
  * family's derived analyses (the q290 syndication matrix, breadth
  * censuses) be SERVED from the index instead of re-deriving grams
  * from text (VERDICT r13 #2 — [[sourceAffinity]]). Corpora without a
  * `source` column index under source = "" (grain degrades to gram).
  * Existence-only probes prune everything but `gram` at scan.
  *
  * Compaction is tiered so its cost tracks what was APPENDED, not the
  * corpus (VERDICT r13 #3 — the old whole-table rewrite at every
  * reclaim is a non-starter for an append-heavy 100 TB index):
  *   - [[compactDelta]] merges only the delta segments — O(appended);
  *   - [[compact]] folds base + deltas into a fresh base — the full
  *     rewrite, now needed only rarely.
  * Both are crash-safe by CATALOG-ATOMIC steps (single-table renames):
  * a merged delta's name encodes the id range it subsumes, so readers
  * ignore covered segments whether or not the post-rename drops ran;
  * the rewritten base carries a `graft.coversDeltaTo` table property
  * that hides every delta it folded in. Readers also SELF-HEAL the
  * major compact's rename window (ADVICE r13 #5): if the base is
  * missing but `{base}_old` / `{base}_compact` survives, it is renamed
  * back before reading.
  *
  * Concurrency contract (ADVICE r13 #5): single WRITER per index name
  * — appends, compactDelta and compact must not race each other.
  * [[graft.streaming.StreamSinks.spanScrubSink]] is such a writer: do
  * not run an out-of-band [[compact]] while the sink is active (the
  * sink runs its own [[compactDelta]], which never touches the base).
  * Stats columns assume each document is indexed ONCE; a crash-replay
  * double-append min-merges to the same scrub results (the exactly-
  * once proof in StreamScrubSpec) but double-counts n_docs/n_occ until
  * the next [[compact]] — which, with the owner sidecar standing,
  * dedupes the (gram, source, doc) grain and re-folds EXACT stats
  * (ADVICE r15 #2); without a sidecar, re-index the affected docs.
  * Scrub correctness never depends on the stats columns.
  */
object GramIndex {

  /** Window length + physical bucket count. The same `minLen` MUST be
    * used by writers and probes (a probe at a different L simply
    * matches nothing — grams of different lengths never collide).
    *
    * `ownerSidecar`: also maintain a `{base}_docs` sidecar at
    * (gram, source, doc_id, n_occ) grain — the (gram, doc) rows whose
    * absence makes owner-dependent operations unrepairable after
    * [[retract]]. With it, [[probe]]/[[scrubProbe]]/[[ownerAttribution]]
    * stay EXACT after takedowns (owners re-derived from surviving docs,
    * cost ∝ the probe's matched grams — no repair step at all), and
    * [[compact]] can fold tombstones away completely. Storage cost is
    * the honest price: one row per distinct (gram, source, doc) versus
    * the default's per-(gram, source) aggregate — opt in when the
    * corpus takes regular takedowns, stay lean when it doesn't. */
  case class Spec(minLen: Int = 8, buckets: Int = 64,
                  ownerSidecar: Boolean = false)

  private def tableName(name: String) = s"${name}_grams".toLowerCase

  private def docsTable(name: String) = s"${tableName(name)}_docs"

  private val CoversProp = "graft.coversDeltaTo"

  /** Comma-joined digests of tombstones a compacted base has already
    * FOLDED (ADVICE r15 #1): stamped on the rewrite in the same
    * pre-rename step as [[CoversProp]], so the instant the swap commits
    * the folded tombstones stop negating — a crash anywhere before the
    * post-swap drops leaves covered garbage, never a double-negation. */
  private val TombProp = "graft.coversTombstones"

  // ------------------------------------------------------------------
  // catalog plumbing
  // ------------------------------------------------------------------

  private def ident(spark: SparkSession, table: String) =
    spark.sessionState.sqlParser.parseTableIdentifier(table)

  private case class Delta(table: String, a: Long, b: Long)

  private def tableProps(spark: SparkSession, table: String): Map[String, String] =
    if (!spark.catalog.tableExists(table)) Map.empty
    else spark.sessionState.catalog.getTableMetadata(ident(spark, table)).properties

  private def coversTo(spark: SparkSession, base: String): Long =
    tableProps(spark, base).get(CoversProp).map(_.toLong).getOrElse(0L)

  private def coveredTombDigests(spark: SparkSession, base: String): Set[String] =
    tableProps(spark, base).get(TombProp).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty).toSet

  /** Every delta segment on disk, INCLUDING subsumed garbage. */
  private def allDeltas(spark: SparkSession, base: String): Seq[Delta] = {
    val re = (java.util.regex.Pattern.quote(base) + "_d(\\d+)_(\\d+)").r
    spark.sessionState.catalog
      .listTables(spark.catalog.currentDatabase, s"${base}_d*")
      .map(_.table)
      .flatMap { t =>
        re.findFirstMatchIn(t).filter(m => m.start == 0 && m.end == t.length)
          .map(m => Delta(t, m.group(1).toLong, m.group(2).toLong))
      }
  }

  /** The LIVE delta cover: drop segments folded into the base
    * (id ≤ coversDeltaTo) and segments contained in a wider merged
    * segment — the name-range subsumption that makes every compaction
    * step crash-safe (the merged table is committed by ONE rename;
    * whether the subsequent drops ran only changes how much garbage
    * the next compaction sweeps). */
  private def liveDeltas(spark: SparkSession, base: String): Seq[Delta] = {
    val covered = coversTo(spark, base)
    val live = allDeltas(spark, base).filter(_.b > covered)
    live.filterNot(d => live.exists(o =>
      o.table != d.table && o.a <= d.a && d.b <= o.b)).sortBy(_.a)
  }

  /** A rebuild's scorched-earth pass: dirs of this index's auxiliary
    * tables (deltas, tombstones, id lists, sidecar, swap temps) left by
    * a PREVIOUS session — the in-memory catalog forgets them, DROP
    * TABLE can't reach them, and a deterministic-named rewrite
    * (digest tombstones, `_d1_1`) would die on LOCATION_ALREADY_EXISTS.
    * Catalog-known tables are dropped properly before this runs; the
    * sweep only reaps the orphans. */
  private def sweepOrphans(spark: SparkSession, base: String): Unit = {
    val dbUri = spark.catalog.getDatabase(spark.catalog.currentDatabase).locationUri
    val dbPath = new org.apache.hadoop.fs.Path(dbUri)
    val fs = dbPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dbPath)) return
    val re = (java.util.regex.Pattern.quote(base.toLowerCase) +
      "_(t[0-9a-f]+|tids_[0-9a-f]+|docs(_compact|_old|_dtmp|_d\\d+_\\d+)?|d\\d+_\\d+|old|compact|dtmp)").r
    fs.listStatus(dbPath).foreach { st =>
      val n = st.getPath.getName
      if (re.findFirstMatchIn(n).exists(m => m.start == 0 && m.end == n.length))
        fs.delete(st.getPath, true)
    }
  }

  /** Self-heal the major compact's rename window (ADVICE r13 #5): no
    * instant of [[compact]] has zero recoverable copies, but between
    * its two renames there is no LIVE table — a concurrent-with-crash
    * probe (or a streaming micro-batch after driver restart) recovers
    * by renaming a surviving copy back instead of failing. `_old` is
    * preferred (the pre-compact base, consistent with still-visible
    * deltas); `_compact` (the rewrite, whose covers-property hides
    * those deltas) is equivalent when `_old` is already gone. */
  private def heal(spark: SparkSession, base: String): Unit =
    if (!spark.catalog.tableExists(base)) {
      if (spark.catalog.tableExists(s"${base}_old"))
        spark.sql(s"ALTER TABLE `${base}_old` RENAME TO `$base`")
      else if (spark.catalog.tableExists(s"${base}_compact"))
        spark.sql(s"ALTER TABLE `${base}_compact` RENAME TO `$base`")
    }

  /** Base + live deltas, healing first — every reader goes through
    * this. */
  private def segmentTables(spark: SparkSession, name: String): Seq[String] = {
    val base = tableName(name)
    heal(spark, base)
    base +: liveDeltas(spark, base).map(_.table)
  }

  /** Segments visible AS OF append id `asOf` — the point-in-time read
    * (VERDICT r15 #10): the base plus every live delta whose range is
    * ≤ asOf. The append history is exactly what the segment ids
    * already encode, so time-travel is a segment FILTER, not a new
    * storage format — and it lasts until a compaction folds the
    * history away. Three states refuse loudly rather than serve an
    * approximation: a base that folded deltas past the cut
    * (coversDeltaTo > asOf), a merged delta straddling it
    * (a ≤ asOf < b), and a standing takedown (retraction REWRITES
    * history — there is deliberately no pre-retraction corpus to
    * serve; that is what a takedown means). */
  private def segmentTablesAsOf(spark: SparkSession, name: String,
                                asOf: Long): Seq[String] = {
    val base = tableName(name)
    heal(spark, base)
    require(tombstones(spark, base).isEmpty,
      s"as-of read on gram index '$name': standing takedown(s) rewrite history — " +
        "the pre-retraction corpus is not served (a retracted document must not " +
        "resurface through time-travel). Compact or rebuild first.")
    val covered = coversTo(spark, base)
    require(covered <= asOf,
      s"as-of read on gram index '$name': the base already folded appends up to " +
        s"$covered > $asOf — major compaction trades history for files; as-of reads " +
        "reach back to the last compact only.")
    val ds = liveDeltas(spark, base)
    ds.find(d => d.a <= asOf && asOf < d.b).foreach(d =>
      throw new IllegalArgumentException(
        s"as-of read on gram index '$name': merged delta ${d.table} straddles " +
          s"append $asOf — minor compaction folded the cut point; as-of reads are " +
          "available at fold boundaries only."))
    base +: ds.filter(_.b <= asOf).map(_.table)
  }

  // ------------------------------------------------------------------
  // owner-sidecar segments (ADVICE r15 #2)
  // ------------------------------------------------------------------

  /** Live sidecar segments `{docs}_d<a>_<b>` — the per-append tables
    * that make [[append]] crash-safe: the sidecar segment is written
    * BEFORE its delta under the SAME id with Overwrite, so a crash
    * between the two writes leaves a segment this filter keeps DEAD
    * (its id exceeds everything the main index covers, so its phantom
    * docs never probe as survivors) and the replay — or simply the next
    * append, whose id derives from MAIN deltas — overwrites it. Folded
    * (≤ the sidecar base's [[CoversProp]]) and range-subsumed segments
    * are garbage, exactly as in [[liveDeltas]]. */
  private def sidecarSegs(spark: SparkSession, name: String): Seq[Delta] = {
    val dt = docsTable(name)
    val base = tableName(name)
    val mainMax = (coversTo(spark, base) +: allDeltas(spark, base).map(_.b)).max
    val covered = coversTo(spark, dt)
    val live = allDeltas(spark, dt).filter(d => d.b > covered && d.b <= mainMax)
    live.filterNot(d => live.exists(o =>
      o.table != d.table && o.a <= d.a && d.b <= o.b)).sortBy(_.a)
  }

  /** Every (gram, source, doc_id, n_occ) row of the sidecar — base plus
    * live segments, healed. A single-segment read keeps the bucketed
    * table (a lone table's layout claim is valid); multi-segment reads
    * go by LOCATION (union hazard note below). Rows may duplicate after
    * a crash-replayed append — min/semi consumers are insensitive, and
    * stats-bearing folds go through [[dedupeSidecar]]. */
  private def sidecarRows(spark: SparkSession, name: String): DataFrame = {
    val dt = docsTable(name)
    heal(spark, dt)
    val segs = sidecarSegs(spark, name)
    if (segs.isEmpty) spark.table(dt)
    else (dt +: segs.map(_.table)).map(readUnbucketed(spark, _))
      .reduce(_ unionByName _)
  }

  /** Collapse crash-replay duplicates to the exact (gram, source, doc)
    * grain: a doc indexed twice carries the same text, so max(n_occ) is
    * its exact count — the fold [[compact]] bakes into the fresh base
    * (ADVICE r15 #2: a replayed append must not inflate n_docs/n_occ
    * permanently). */
  private def dedupeSidecar(rows: DataFrame): DataFrame =
    rows.groupBy(col("gram"), col("source"), col("doc_id"))
      .agg(max(col("n_occ")).as("n_occ"))

  // ------------------------------------------------------------------
  // building
  // ------------------------------------------------------------------

  /** The L-token window hashes of a corpus, one row per (doc, window):
    * a pure projection over the token array — no shuffle until the
    * caller aggregates or writes. Carries the corpus's `source` column
    * when present ("" otherwise) so segment rows can keep per-source
    * stats. */
  private[dedup] def gramsOf(docs: DataFrame, L: Int): DataFrame = {
    val src = if (docs.columns.contains("source")) col("source") else lit("")
    // r16 narrow-input guard — ROUND-ROBIN on purpose, never a hash
    // claim: a doc_id-hash spread here flows through the broadcast
    // semi joins of multi-segment probes, every union child then
    // claims the same HashPartitioning, Spark 4.1's UnionExec
    // propagates it, and AQE elides the different-key repartition
    // matchedWindows depends on for cross-segment dedup (the
    // unionOutputPartitioning hazard — caught by LibraryLintSpec on
    // q305). RoundRobinPartitioning satisfies no ClusteredDistribution,
    // so no downstream barrier can ever be elided by this spread.
    graft.ops.RelationalOps.spreadNarrowInput(
        docs.select(col("doc_id"), src.as("source"),
            TextFunctions.tokens(col("text")).as("ts"))
          .where(size(col("ts")) >= L))
      .select(col("doc_id"), col("source"), posexplode(transform(
        sequence(lit(0), size(col("ts")) - L),
        i => md5(array_join(slice(col("ts"), i + 1, lit(L)), " ")))))
      .toDF("doc_id", "source", "pos", "gram")
  }

  /** One segment's rows: (gram, source) grain with the min-doc owner
    * and the per-source doc/occurrence counts. */
  private def segmentRowsFromGrams(grams: DataFrame): DataFrame =
    grams
      .groupBy(col("gram"), col("source"))
      .agg(min(col("doc_id")).as("owner"),
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .select("gram", "owner", "source", "n_docs", "n_occ")

  private def segmentRows(corpus: DataFrame, L: Int): DataFrame =
    segmentRowsFromGrams(gramsOf(corpus, L))

  /** Sidecar rows: (gram, source, doc_id) grain with the per-doc
    * occurrence count — everything a post-takedown owner re-derivation
    * needs (owner = min surviving doc; stats re-aggregate exactly). */
  private def sidecarRowsFromGrams(grams: DataFrame): DataFrame =
    grams.groupBy(col("gram"), col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))

  private def writeSegment(rows: DataFrame, table: String, spec: Spec,
                           mode: SaveMode = SaveMode.Overwrite): Unit =
    rows.repartition(spec.buckets, col("gram"))
      .write.mode(mode)
      .bucketBy(spec.buckets, "gram").sortBy("gram")
      .saveAsTable(table)

  /** Materialize (or replace) the index: a fresh base segment; any
    * leftover deltas/side tables of the same name are dropped. */
  def write(corpus: DataFrame, name: String, spec: Spec = Spec(),
            mode: SaveMode = SaveMode.Overwrite): Unit =
    if (mode == SaveMode.Append) append(corpus, name, spec)
    else {
      val spark = corpus.sparkSession
      val base = tableName(name)
      SignatureIndex.dropStale(spark, base)
      allDeltas(spark, base).foreach(d =>
        spark.sql(s"DROP TABLE IF EXISTS `${d.table}`"))
      (allTombstones(spark, base) ++ tidsTables(spark, base)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")) // rebuild clears takedowns
      Seq("_old", "_compact", "_dtmp").foreach(s =>
        SignatureIndex.dropStale(spark, s"$base$s"))
      allDeltas(spark, docsTable(name)).foreach(d =>
        spark.sql(s"DROP TABLE IF EXISTS `${d.table}`"))
      SignatureIndex.dropStale(spark, docsTable(name))
      Seq("_old", "_compact", "_dtmp").foreach(s =>
        SignatureIndex.dropStale(spark, s"${docsTable(name)}$s"))
      sweepOrphans(spark, base)
      if (spec.ownerSidecar) {
        // one text pass feeds both grains
        val grams = gramsOf(corpus, spec.minLen).persist()
        try {
          writeSegment(segmentRowsFromGrams(grams), base, spec)
          writeSegment(sidecarRowsFromGrams(grams), docsTable(name), spec)
        } finally { grams.unpersist(); () }
      } else writeSegment(segmentRows(corpus, spec.minLen), base, spec)
    }

  /** Add newly-accepted documents' grams to the standing index — ONE
    * new delta segment (the standing tables are untouched, so an
    * append costs O(new docs) regardless of corpus size). A gram
    * already standing may reappear here, possibly with a smaller
    * owner; readers min-merge, [[compactDelta]]/[[compact]] fold.
    * When the owner sidecar stands, the batch's (gram, doc) rows land
    * as a sidecar SEGMENT under the same id, written FIRST and with
    * Overwrite (ADVICE r15 #2): a crash between the two writes leaves
    * only a dead sidecar segment (the main index never covers its id —
    * [[sidecarSegs]]) that the replay or the next append rewrites, so
    * no window exists where an indexed doc is missing from the sidecar
    * — the coverage invariant post-takedown owner ops depend on. */
  def append(newDocs: DataFrame, name: String, spec: Spec = Spec()): Unit = {
    val spark = newDocs.sparkSession
    val base = tableName(name)
    heal(spark, base)
    val next = (coversTo(spark, base) +: allDeltas(spark, base).map(_.b)).max + 1
    if (spark.catalog.tableExists(docsTable(name))) {
      val grams = gramsOf(newDocs, spec.minLen).persist()
      try {
        val sideSeg = s"${docsTable(name)}_d${next}_${next}"
        SignatureIndex.dropStale(spark, sideSeg) // cross-session replay
        writeSegment(sidecarRowsFromGrams(grams), sideSeg, spec)
        writeSegment(segmentRowsFromGrams(grams), s"${base}_d${next}_${next}", spec)
      } finally { grams.unpersist(); () }
    } else
      writeSegment(segmentRows(newDocs, spec.minLen),
        s"${base}_d${next}_${next}", spec)
  }

  // ------------------------------------------------------------------
  // retraction (takedown without rebuild)
  // ------------------------------------------------------------------

  /** Tombstone segments `{base}_t<digest>` written by [[retract]] (hex
    * digest of the retracted id set; legacy numeric names still match).
    * They are NOT deltas: [[liveDeltas]] never lists them, so delta
    * compactions never fold them. The `_tids_` id-list tables pair with
    * them 1:1 by digest and never match this pattern ('i' is not hex).
    * This lists everything on disk INCLUDING covered garbage — cleanup
    * paths use it; readers use [[tombstones]]. */
  private def allTombstones(spark: SparkSession, base: String): Seq[String] = {
    val re = (java.util.regex.Pattern.quote(base) + "_t([0-9a-f]+)").r
    spark.sessionState.catalog
      .listTables(spark.catalog.currentDatabase, s"${base}_t*")
      .map(_.table)
      .filter(t => re.findFirstMatchIn(t).exists(m => m.start == 0 && m.end == t.length))
  }

  /** The LIVE tombstones: segments the base has already folded
    * ([[TombProp]]) are post-swap garbage of a crashed [[compact]] and
    * must not negate again (ADVICE r15 #1). */
  private def tombstones(spark: SparkSession, base: String): Seq[String] = {
    val covered = coveredTombDigests(spark, base)
    allTombstones(spark, base)
      .filterNot(t => covered.contains(t.stripPrefix(s"${base}_t")))
  }

  /** Reap covered takedown tables (a crashed [[compact]]'s post-swap
    * garbage): drop the tables FIRST, clear the stamp LAST — the
    * reverse order would make the garbage live again mid-crash. Run by
    * the writers ([[retract]], [[compact]]) so a later takedown whose
    * id set reproduces a folded digest gets a fresh, LIVE tombstone
    * instead of being silently hidden by the stale stamp. */
  private def sweepCoveredTakedowns(spark: SparkSession, base: String): Unit = {
    val covered = coveredTombDigests(spark, base)
    if (covered.nonEmpty) {
      (allTombstones(spark, base)
          .filter(t => covered.contains(t.stripPrefix(s"${base}_t"))) ++
        tidsTables(spark, base)
          .filter(t => covered.contains(t.stripPrefix(s"${base}_tids_"))))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
      spark.sql(s"ALTER TABLE `$base` SET TBLPROPERTIES ('$TombProp' = '')")
    }
  }

  /** Id-list tables `{base}_tids_<digest>`, one per applied [[retract]]:
    * the doc ids behind each tombstone. They buy (a) overlap/replay
    * dedup at retract time (ADVICE r14 #1 — a doc named twice must not
    * double-negate) and (b) the anti-join set for sidecar-served owner
    * operations. */
  private def tidsTables(spark: SparkSession, base: String): Seq[String] =
    spark.sessionState.catalog
      .listTables(spark.catalog.currentDatabase, s"${base}_tids_*")
      .map(_.table)
      .filter(_.startsWith(s"${base}_tids_"))

  /** Every doc id retracted so far; None when none. */
  private def retractedIds(spark: SparkSession, base: String): Option[DataFrame] = {
    val ts = tidsTables(spark, base)
    if (ts.isEmpty) None
    else Some(ts.map(spark.table).reduce(_ unionByName _)
      .select("doc_id").distinct())
  }

  /** An order-independent digest of a (small, takedown-sized) id set,
    * computed distributively — count plus two INDEPENDENT 64-bit xor
    * folds (xor is overflow-free under ANSI, unlike a hash sum),
    * rendered as 48 hex chars: the deterministic tombstone name that
    * makes a crash-replayed retract REWRITE the same segment instead
    * of double-negating (ADVICE r14 #1). None for an empty set
    * (nothing new to retract). */
  private def idDigest(ids: DataFrame): Option[String] = {
    val r = ids.agg(
      count(lit(1)).cast("long").as("n"),
      coalesce(expr("bit_xor(xxhash64(doc_id))"), lit(0L)).as("x1"),
      coalesce(expr("bit_xor(xxhash64('g', doc_id))"), lit(0L)).as("x2")).head()
    if (r.getLong(0) == 0L) None
    else Some(String.format("%016x%016x%016x",
      Long.box(r.getLong(0)), Long.box(r.getLong(1)), Long.box(r.getLong(2))))
  }

  /** Owner-dependent operations after [[retract]]: EXACT when the
    * owner sidecar stands (owners re-derived from surviving docs —
    * returns the live sidecar rows to derive from), REFUSED loudly
    * when it doesn't (stored owners may be retracted documents and
    * there is nothing to repair them from). None when no retraction
    * ever happened — callers keep their tombstone-free plans. */
  private def ownerBasis(spark: SparkSession, name: String, op: String): Option[DataFrame] = {
    val base = tableName(name)
    val ts = tombstones(spark, base)
    if (ts.isEmpty) None
    else {
      require(spark.catalog.tableExists(docsTable(name)),
        s"$op on gram index '$name' is owner-dependent and unsupported after retract(): " +
          s"tombstone segment(s) ${ts.mkString(", ")} may invalidate stored owners and this " +
          "index keeps no (gram, doc) rows to repair them from. Rebuild with write() " +
          s"(or build with Spec(ownerSidecar = true)) before $op.")
      val tDigests = ts.map(_.stripPrefix(s"${base}_t")).toSet
      val iDigests = tidsTables(spark, base).map(_.stripPrefix(s"${base}_tids_")).toSet
      require(tDigests.subsetOf(iDigests),
        s"$op on gram index '$name': tombstone(s) without a paired id list " +
          s"(${(tDigests -- iDigests).mkString(", ")}) — the retracted ids are unknown, " +
          "owners cannot be re-derived. Rebuild with write().")
      val ids = retractedIds(spark, base).get
      Some(sidecarRows(spark, name)
        .join(graft.ops.Hints.guardedBroadcast(ids), Seq("doc_id"), "left_anti"))
    }
  }

  /** REMOVE documents from the standing index without a rebuild — the
    * takedown path (DMCA, consent withdrawal, a poisoned source): one
    * tombstone segment carrying the retracted documents' grams with
    * NEGATED stats, so every stats-served analytic nets them out
    * exactly, plus one id-list table naming what was retracted. Cost ∝
    * retracted docs, never corpus.
    *
    * Contract:
    *  - pass the documents as indexed — the caller has them (a takedown
    *    names its targets). Ids already retracted are dropped BEFORE
    *    the stats are negated, and the tombstone/id tables are named by
    *    a deterministic digest of the remaining id set and written with
    *    Overwrite — so a crash-REPLAYED retract rewrites the same two
    *    tables, an OVERLAPPING second takedown negates only its new
    *    ids, and a retract whose every id was already applied is a
    *    no-op (ADVICE r14 #1: double-negation cannot occur). The
    *    tombstone lands first; a crash before the id list commits
    *    leaves a replay that recomputes the same set, digest and
    *    tables. Retracting a never-indexed doc still negates grams it
    *    shares with indexed text — pass indexed documents.
    *  - EXACT after retraction (spec-pinned ≡ rebuild-without-docs):
    *    [[sourceStats]], [[sourceAffinity]], [[attributeSources]] and
    *    everything built on them — they consume only the summable
    *    (n_docs, n_occ) columns, and a (gram, source) whose net doc
    *    count reaches 0 disappears.
    *  - Owner-dependent paths ([[probe]], [[scrubProbe]],
    *    [[ownerAttribution]], [[compact]]): EXACT too when the index
    *    was built with `Spec(ownerSidecar = true)` — owners re-derive
    *    from surviving docs at probe time, no repair step, cost ∝ the
    *    probe's matched grams; REFUSED loudly otherwise
    *    ([[ownerBasis]]). [[compactDelta]] stays available either way
    *    (it folds only `_d` segments; tombstones net the same against
    *    the folded rows). [[append]] stays available (new docs,
    *    additive stats).
    *  - without the sidecar, tombstones stand until the next [[write]]
    *    rebuild; with it, [[compact]] folds them away completely. Each
    *    stats probe pays O(tombstone rows) to net them until then —
    *    honest economics, stated rather than hidden. */
  def retract(docs: DataFrame, name: String, spec: Spec = Spec()): Unit = {
    val spark = docs.sparkSession
    val base = tableName(name)
    heal(spark, base)
    sweepCoveredTakedowns(spark, base)
    // an UNPAIRED live tombstone (a previous retract crashed between
    // its two writes) makes overlap arithmetic impossible — its ids are
    // unknown, so any takedown other than the exact replay of the
    // crashed one could double-negate (ADVICE r15 #3). The exact replay
    // recomputes the same id set, hence the same digest, and is let
    // through to heal by rewriting both tables.
    val orphans = tombstones(spark, base).map(_.stripPrefix(s"${base}_t")).toSet --
      tidsTables(spark, base).map(_.stripPrefix(s"${base}_tids_")).toSet
    val newDocs0 = retractedIds(spark, base) match {
      case None => docs
      case Some(ids) => docs.join(
        graft.ops.Hints.guardedBroadcast(ids), Seq("doc_id"), "left_anti")
    }
    val newDocs = newDocs0.persist() // digest agg + negated-stats gram pass
    try idDigest(newDocs.select(col("doc_id")).distinct()) match {
      case None =>
        require(orphans.isEmpty,
          s"retract on gram index '$name': tombstone(s) without a paired id list " +
            s"(${orphans.mkString(", ")}) — a previous retract() crashed between its " +
            "two writes and this call does not replay it. Replay the exact original " +
            "retract to heal, or rebuild with write(); proceeding could double-negate " +
            "the unknown retracted set.")
        () // everything already retracted — replay/overlap no-op
      case Some(dg) =>
        require(orphans.subsetOf(Set(dg)),
          s"retract on gram index '$name': tombstone(s) without a paired id list " +
            s"(${(orphans - dg).mkString(", ")}) — a previous retract() crashed between " +
            "its two writes and this call does not replay it. Replay the exact original " +
            "retract to heal, or rebuild with write(); proceeding could double-negate " +
            "the unknown retracted set.")
        // a replay in a FRESH session (in-memory catalog lost, dirs
        // survive) must still rewrite, not die on the orphaned location
        SignatureIndex.dropStale(spark, s"${base}_t$dg")
        SignatureIndex.dropStale(spark, s"${base}_tids_$dg")
        writeSegment(
          segmentRows(newDocs, spec.minLen)
            .select(col("gram"), col("owner"), col("source"),
              (-col("n_docs")).as("n_docs"), (-col("n_occ")).as("n_occ")),
          s"${base}_t$dg", spec)
        newDocs.select(col("doc_id")).distinct()
          .write.mode(SaveMode.Overwrite).saveAsTable(s"${base}_tids_$dg")
    } finally { newDocs.unpersist(); () }
  }

  // ------------------------------------------------------------------
  // compaction
  // ------------------------------------------------------------------

  /** UNION-OF-BUCKETED-TABLES HAZARD, load-bearing for every reader
    * below: under `spark.sql.unionOutputPartitioning` (default TRUE in
    * Spark 4.1), a Union whose children all report the same
    * HashPartitioning CLAIMS that partitioning — but UnionExec
    * CONCATENATES child partitions rather than zipping them, so equal
    * keys from two same-bucketed segment tables sit in different
    * output partitions while the planner elides the exchange a keyed
    * aggregate needs — and an EXPLICIT same-key repartition is elided
    * too (redundant-shuffle removal trusts the claim). Measured here:
    * groupBy(gram, source) over base ∪ delta returned BOTH pre-merge
    * rows, with or without `.repartition(col("gram"))` (GramIndexSpec's
    * count-vs-distinct pins the regression). Multi-segment readers are
    * therefore built so no union's claim is ever load-bearing:
    * segment-scan unions read the files by LOCATION (an unbucketed
    * scan claims nothing, so the planner inserts the real exchange),
    * and same-key re-aggregations use per-gram JOINS (whose
    * co-partitioned zip IS valid) instead of a union. */
  private def readUnbucketed(spark: SparkSession, table: String): DataFrame = {
    val meta = spark.sessionState.catalog.getTableMetadata(ident(spark, table))
    spark.read.schema(spark.table(table).schema).parquet(meta.location.toString)
  }

  private def mergeSegments(spark: SparkSession, tables: Seq[String]): DataFrame =
    tables.map(readUnbucketed(spark, _)).reduce(_ unionByName _)
      .groupBy(col("gram"), col("source"))
      .agg(min(col("owner")).as("owner"),
        sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("n_occ")).cast("long").as("n_occ"))
      .select("gram", "owner", "source", "n_docs", "n_occ")

  private def dropGarbageDeltas(spark: SparkSession, base: String): Unit = {
    val live = liveDeltas(spark, base).map(_.table).toSet
    allDeltas(spark, base).filterNot(d => live.contains(d.table))
      .foreach(d => spark.sql(s"DROP TABLE IF EXISTS `${d.table}`"))
  }

  /** MINOR compaction — merge the delta segments into one, leaving the
    * base untouched: cost is O(appended since the last fold), never
    * O(corpus) (VERDICT r13 #3). Commit is the single rename of the
    * merged table to its range name `d<min>_<max>`, which subsumes the
    * inputs by construction; dropping them afterwards is cleanup that
    * any later compaction re-sweeps. No-op with fewer than two live
    * deltas (beyond garbage sweeping). */
  def compactDelta(spark: SparkSession, name: String, spec: Spec = Spec()): Unit = {
    val base = tableName(name)
    heal(spark, base)
    val ds = liveDeltas(spark, base)
    if (ds.size >= 2) {
      val tmp = s"${base}_dtmp"
      SignatureIndex.dropStale(spark, tmp)
      writeSegment(mergeSegments(spark, ds.map(_.table)), tmp, spec)
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `${base}_d${ds.map(_.a).min}_${ds.map(_.b).max}`")
      ds.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `${d.table}`"))
    }
    dropGarbageDeltas(spark, base)
    // the sidecar's per-append segments fold by the same range-name
    // protocol — a streaming sink's micro-batch appends must not fan
    // the sidecar read in unboundedly
    if (spark.catalog.tableExists(docsTable(name))) {
      val dt = docsTable(name)
      val segs = sidecarSegs(spark, name)
      if (segs.size >= 2) {
        val tmp = s"${dt}_dtmp"
        SignatureIndex.dropStale(spark, tmp)
        writeSegment(dedupeSidecar(
          segs.map(s => readUnbucketed(spark, s.table)).reduce(_ unionByName _)),
          tmp, spec)
        spark.sql(s"ALTER TABLE `$tmp` RENAME TO `${dt}_d${segs.map(_.a).min}_${segs.map(_.b).max}`")
        segs.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `${d.table}`"))
      }
      // non-live sidecar segments are garbage: folded into the sidecar
      // base, range-subsumed, or orphans whose main delta never
      // committed (their docs are not in the index — nothing is lost)
      val live = sidecarSegs(spark, name).map(_.table).toSet
      allDeltas(spark, dt).filterNot(d => live.contains(d.table))
        .foreach(d => spark.sql(s"DROP TABLE IF EXISTS `${d.table}`"))
    }
  }

  /** MAJOR compaction — rewrite base + deltas as one fresh base with
    * one file per bucket, reclaiming append small-files and duplicate
    * gram rows; catalog-rename swap, probe plan unchanged.
    *
    * Swap order is crash-safe (ADVICE r12 #3): the standing base is
    * renamed ASIDE first, so no instant has zero recoverable copies —
    * a crash between the two renames leaves `{base}_old` (full
    * pre-compact data, consistent with the still-visible deltas) and
    * `{base}_compact` (full rewrite whose covers-property hides those
    * deltas); readers [[heal]] from either. The covers-property also
    * closes the r13 gap a delta-aware compact would otherwise open: a
    * crash after the swap but before the delta drops must not leave
    * the folded deltas double-counted. */
  def compact(spark: SparkSession, name: String, spec: Spec = Spec()): Unit = {
    val base = tableName(name)
    heal(spark, base)
    heal(spark, docsTable(name))
    sweepCoveredTakedowns(spark, base)
    // with tombstones standing this is the full-reclamation point: the
    // fresh base re-aggregates from the sidecar's SURVIVING docs (exact
    // owners, exact stats — ≡ rebuild-without-docs), the sidecar drops
    // its retracted rows, and the tombstone/id tables clear. Without a
    // sidecar, ownerBasis refuses — stored owners can't be repaired.
    val basis = ownerBasis(spark, name, "compact")
    // digests being folded, stamped onto the rewrite NEXT TO CoversProp
    // (ADVICE r15 #1): the instant the base swap commits, these
    // tombstones stop negating — the post-swap drops are pure cleanup,
    // and a crash between swap and drops cannot double-negate the
    // stats-served paths.
    val foldedTombs = tombstones(spark, base).map(_.stripPrefix(s"${base}_t"))
    val ds = liveDeltas(spark, base)
    val covers = (coversTo(spark, base) +: allDeltas(spark, base).map(_.b)).max
    val tmp = s"${base}_compact"
    val old = s"${base}_old"
    SignatureIndex.dropStale(spark, tmp)
    SignatureIndex.dropStale(spark, old)
    // when the sidecar stands, the fresh base folds from it even
    // without tombstones: [[dedupeSidecar]] collapses crash-replay
    // double-appends, so compaction RE-FOLDS exact stats instead of
    // baking the inflated counts in (ADVICE r15 #2)
    val liveSidecar =
      (basis match {
        case Some(b) => Some(dedupeSidecar(b))
        case None if spark.catalog.tableExists(docsTable(name)) =>
          Some(dedupeSidecar(sidecarRows(spark, name)))
        case None => None
      }).map(_.persist()) // base rewrite + sidecar rewrite
    writeSegment(liveSidecar match {
      case Some(live) => live.groupBy(col("gram"), col("source"))
        .agg(min(col("doc_id")).as("owner"),
          count(lit(1)).cast("long").as("n_docs"), // deduped grain: one row per doc
          sum(col("n_occ")).cast("long").as("n_occ"))
        .select("gram", "owner", "source", "n_docs", "n_occ")
      case None => mergeSegments(spark, base +: ds.map(_.table))
    }, tmp, spec)
    spark.sql(s"ALTER TABLE `$tmp` SET TBLPROPERTIES (" +
      s"'$CoversProp' = '$covers', '$TombProp' = '${foldedTombs.mkString(",")}')")
    // sidecar swap BEFORE the base swap: every window of this function
    // then has a sidecar consistent with (or ahead of) the base — a
    // stale sidecar behind a folded base would let covered-garbage
    // sweeps orphan its retracted rows as phantom survivors
    if (spark.catalog.tableExists(docsTable(name))) {
      val dt = docsTable(name)
      val dTmp = s"${dt}_compact"
      val dOld = s"${dt}_old"
      SignatureIndex.dropStale(spark, dTmp)
      SignatureIndex.dropStale(spark, dOld)
      writeSegment(liveSidecar.get, dTmp, spec)
      spark.sql(s"ALTER TABLE `$dTmp` SET TBLPROPERTIES ('$CoversProp' = '$covers')")
      spark.sql(s"ALTER TABLE `$dt` RENAME TO `$dOld`")
      spark.sql(s"ALTER TABLE `$dTmp` RENAME TO `$dt`")
      spark.sql(s"DROP TABLE `$dOld`")
      allDeltas(spark, dt).foreach(d =>
        spark.sql(s"DROP TABLE IF EXISTS `${d.table}`")) // folded (CoversProp)
    }
    spark.sql(s"ALTER TABLE `$base` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$base`")
    spark.sql(s"DROP TABLE `$old`")
    allDeltas(spark, base).foreach(d =>
      spark.sql(s"DROP TABLE IF EXISTS `${d.table}`"))
    (allTombstones(spark, base) ++ tidsTables(spark, base)).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    liveSidecar.foreach(_.unpersist())
  }

  // ------------------------------------------------------------------
  // probing
  // ------------------------------------------------------------------

  /** Maximal ≥ minLen-token spans of `batch` documents already present
    * verbatim in the indexed corpus — [[Dedup.dupSpansAgainst]]'s
    * output contract ((doc_id, span_start, span_len, n_windows)), with
    * every index segment read bucketed, exchange-free. Per-window
    * guarantee, as in [[Dedup.dupSpans]]: a span may chain across
    * different corpus documents. */
  def probe(spark: SparkSession, batch: DataFrame,
            name: String, spec: Spec = Spec()): DataFrame = {
    val basis = ownerBasis(spark, name, "probe")
    val L = spec.minLen
    val segs = segmentTables(spark, name)
    val bg0 = gramsOf(batch, L)
    val bg = if (segs.size == 1 || basis.nonEmpty) bg0
      else bg0.persistT // one gram pass, N semi joins
    val matched = basis match {
      // post-takedown: a window matches iff a SURVIVING doc holds it —
      // the sidecar (retracted ids anti-joined) is exactly that set,
      // consumed in its gram-bucket layout (≡ rebuild-without-docs)
      case Some(live) =>
        bg.join(live.select(col("gram")), Seq("gram"), "left_semi")
      case None => matchedWindows(spark, bg, segs)
    }
    windowIslands(matched, L)
  }

  /** Batch windows standing in any of `segs`, cross-segment duplicates
    * collapsed. Repartition by doc_id before the dedup: the union's
    * children all claim hash(gram) (see hazard note), and a distinct
    * on top would be planned exchange-free and keep cross-segment
    * duplicates — a DIFFERENT-key repartition is not elidable, forces
    * the real shuffle, and is the partitioning the island window wants
    * next. */
  private def matchedWindows(spark: SparkSession, bg: DataFrame,
                             segs: Seq[String]): DataFrame =
    if (segs.size == 1) bg.join(spark.table(segs.head), Seq("gram"), "left_semi")
    else segs.map(t => bg.join(spark.table(t), Seq("gram"), "left_semi"))
      .reduce(_ unionByName _)
      .repartition(col("doc_id"))
      .distinct() // a gram standing in two segments matches twice

  /** Maximal-span islands over matched (doc_id, pos) windows — the
    * probe output contract. */
  private def windowIslands(matched: DataFrame, L: Int): DataFrame =
    matched
      .withColumn("grp", col("pos") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) - min(col("pos")) + L).cast("long").as("span_len"),
        count(lit(1)).as("n_windows"))
      .drop("grp")

  /** [[probe]] against the corpus AS OF append `asOf` (VERDICT r15
    * #10) — the same plan over the segment subset the cut selects;
    * refusal conditions in [[segmentTablesAsOf]]. */
  def probeAsOf(spark: SparkSession, batch: DataFrame, name: String,
                asOf: Long, spec: Spec = Spec()): DataFrame = {
    val segs = segmentTablesAsOf(spark, name, asOf)
    val bg0 = gramsOf(batch, spec.minLen)
    val bg = if (segs.size == 1) bg0 else bg0.persistT
    windowIslands(matchedWindows(spark, bg, segs), spec.minLen)
  }

  /** [[sourceStats]] AS OF append `asOf` — the standing statistics as
    * they stood after that append (same refusals). */
  def sourceStatsAsOf(spark: SparkSession, name: String, asOf: Long): DataFrame = {
    val segs = segmentTablesAsOf(spark, name, asOf)
    if (segs.size == 1)
      spark.table(segs.head).select("gram", "source", "n_docs", "n_occ")
    else
      segs.map(readUnbucketed(spark, _)).reduce(_ unionByName _)
        .groupBy(col("gram"), col("source"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_occ")).cast("long").as("n_occ"))
        .where(col("n_docs") > 0)
  }

  /** Incremental span SCRUBBING against the standing corpus — EXACTLY
    * [[Dedup.spanScrub]] on (corpus ∪ batch) restricted to batch docs,
    * without ever re-shuffling the corpus (the q282 semantics for an
    * arriving shard; GramIndexSpec pins the equivalence).
    *
    * A batch position is removed iff it is covered by an L-window that
    * is duplicated IN THE UNION (standing in the corpus, or held by ≥ 2
    * batch docs) and whose union-wide owner — min doc_id across the
    * indexed owner and the batch's own minimum — is another doc.
    *
    * Scale shape: the batch is gram'd and censused (cost ∝ shard); each
    * index segment contributes owners only for the batch's grams via a
    * bucket-layout semi-restriction followed by a min-merge (append-
    * safe: duplicate gram rows across segments collapse to the true
    * minimum), so index-side cost is the matched rows, never the
    * corpus; the rollup is [[Dedup.scrubRollup]], pruned to affected
    * docs. */
  def scrubProbe(spark: SparkSession, batch: DataFrame,
                 name: String, spec: Spec = Spec()): DataFrame = {
    val L = spec.minLen
    val toked = batch
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
    val toks = toked.select(col("doc_id"), posexplode(col("ts")))
      .toDF("doc_id", "pos", "tok")
    // consumed twice (census + removal explode): persist, or the
    // batch's md5 windowing re-executes per consumer
    val grams = gramsOf(batch, L).persistT
    val batchCensus = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd_b"), min(col("doc_id")).as("min_b"))
    val owned = unionOwned(spark, name, "scrubProbe", batchCensus)
    val removed = grams.join(owned, Seq("gram"))
      .where(col("doc_id") =!= col("owner"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + L - 1)).as("pos"))
      .distinct()
      .persistT // consumed twice inside the rollup (doc prune + mark)
    Dedup.scrubRollup(toks, removed)
  }

  /** UNION-wide ownership of a batch's grams — the shared kernel of
    * [[scrubProbe]] and [[ownerAttribution]]. `batchCensus` is the
    * batch-side (gram, nd_b, min_b) census; the result is one row per
    * gram that is duplicated in (corpus ∪ batch) — standing in the
    * corpus, or held by ≥ 2 batch docs — with the union-wide owner
    * (min doc_id across the indexed owners and the batch minimum).
    *
    * Corpus owners come from each segment's rows SEMI-restricted to
    * the batch's grams (bucket layout kept — no corpus exchange); the
    * cross-segment min-merge is a FULL-OUTER join fold, not a union:
    * per-gram joins of co-partitioned segments zip partitions validly
    * (see the union hazard note above); least() skips nulls. After a
    * retraction (tombstones standing), owners come from the sidecar's
    * SURVIVING docs instead — same semi-restriction to the batch's
    * grams, same bucket layout, exact ≡ rebuild-without-docs. */
  private def unionOwned(spark: SparkSession, name: String, op: String,
                         batchCensus: DataFrame): DataFrame = {
    val idxOwners = ownerBasis(spark, name, op) match {
      case Some(live) =>
        live.join(batchCensus.select(col("gram")), Seq("gram"), "left_semi")
          .groupBy(col("gram")).agg(min(col("doc_id")).as("owner_c"))
      case None =>
        segmentTables(spark, name).map(t =>
            spark.table(t)
              .join(batchCensus.select(col("gram")), Seq("gram"), "left_semi")
              .groupBy(col("gram")).agg(min(col("owner")).as("owner_c")))
          .reduce { (a, b) =>
            a.withColumnRenamed("owner_c", "oa")
              .join(b.withColumnRenamed("owner_c", "ob"), Seq("gram"), "full")
              .select(col("gram"), least(col("oa"), col("ob")).as("owner_c"))
          }
    }
    batchCensus.join(idxOwners, Seq("gram"), "left")
      .where(col("owner_c").isNotNull || col("nd_b") >= 2)
      .select(col("gram"),
        least(coalesce(col("owner_c"), col("min_b")), col("min_b")).as("owner"))
  }

  // ------------------------------------------------------------------
  // index-served leak attribution
  // ------------------------------------------------------------------

  /** Source-grain leak attribution SERVED from the standing index —
    * WHO (which corpus SOURCE) leaked into each arriving eval doc.
    * The q289 triage re-grounded to what a 100 TB index can answer
    * without (gram, doc) rows: per batch doc, the corpus source
    * sharing the most L-token windows with it (ties to the smaller
    * source string), the doc's total matched-window count, and its
    * over-cap window count.
    *
    * Breadth-cap discipline, exactly q289's at the index's grain: a
    * gram's corpus-doc breadth is the per-source `n_docs` summed over
    * sources (a document has one source and is indexed once), and only
    * grams with breadth ≤ `maxDocs` attribute — boilerplate held by a
    * million docs must not fan the attribution join out. Over-cap
    * windows are still COUNTED per doc (n_wide_windows — contamination
    * never silently disappears), and a doc whose every match is
    * over-cap reports a NULL source rather than vanishing.
    *
    * Scale shape: the batch is gram'd once (cost ∝ shard); each
    * segment's (gram, source, n_docs, n_occ) rows are semi-restricted
    * to the batch's grams in their bucket layout (index-side cost ∝
    * matches, never corpus), cross-segment stats sum-merge as a join
    * fold (union hazard note above); the attribution join fans each
    * batch window out to at most min(|sources|, maxDocs) source rows;
    * the top-1 rank is a doc-partitioned window over ≤ |batch|·|S|
    * rows. Stats caveat as documented on the object: a crash-replay
    * double-append inflates n_docs until compaction re-folds — scrub
    * correctness never depends on the stats columns, attribution
    * breadth caps do (an inflated count can only make the cap FIRE
    * early, never explode the join). */
  def attributeSources(spark: SparkSession, batch: DataFrame,
                       name: String, spec: Spec = Spec(),
                       maxDocs: Int = 100): DataFrame = {
    val segs = segmentTables(spark, name) ++ tombstones(spark, tableName(name))
    val bg = gramsOf(batch, spec.minLen)
      .select("doc_id", "pos", "gram").persistT // gram-set + 2 rollups
    val bgrams = bg.select("gram").distinct()
    val statsSegs = segs.map(t =>
      spark.table(t).join(bgrams, Seq("gram"), "left_semi")
        .select(col("gram"), col("source"), col("n_docs"), col("n_occ")))
    val statsMerged = statsSegs.reduce { (a, b) =>
      a.withColumnsRenamed(Map("n_docs" -> "da", "n_occ" -> "oa"))
        .join(b.withColumnsRenamed(Map("n_docs" -> "db", "n_occ" -> "ob")),
          Seq("gram", "source"), "full")
        .select(col("gram"), col("source"),
          (coalesce(col("da"), lit(0L)) + coalesce(col("db"), lit(0L))).as("n_docs"),
          (coalesce(col("oa"), lit(0L)) + coalesce(col("ob"), lit(0L))).as("n_occ"))
    }
    // tombstones net through the same fold; fully-retracted rows vanish
    val stats = (if (segs.size == 1) statsMerged
      else statsMerged.where(col("n_docs") > 0))
      .persistT // breadth census + narrow side of the attribution join
    val breadth = stats.groupBy(col("gram"))
      .agg(sum(col("n_docs")).cast("long").as("nd_c")).persistT
    val narrow = stats.join(
      breadth.where(col("nd_c") <= maxDocs).select("gram"), Seq("gram"), "left_semi")
    val pairs = bg.join(narrow.select("gram", "source"), Seq("gram"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shared"))
    val top = pairs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("n_shared").desc, col("source"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("source").as("contaminating_source"),
        col("n_shared"))
    val tot = bg.join(breadth, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched_windows"),
        sum(when(col("nd_c") > maxDocs, 1L).otherwise(0L)).as("n_wide_windows"))
    tot.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("contaminating_source"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_matched_windows"), col("n_wide_windows"))
  }

  /** Doc-grain scrub PROVENANCE served from the standing index — for
    * each batch doc that [[scrubProbe]] would cut, the document that
    * OWNS the templates cutting it ("my doc was scrubbed — which
    * training doc do I pull"). Exact q289-style attribution needs
    * (gram, doc) rows the index deliberately does not keep; ownership
    * is what it does keep, and owner-grain is the answer the SCRUB
    * itself acts on — a window is removed iff its union-wide owner is
    * another doc, so attributing removals to owners accounts for every
    * removed window exactly.
    *
    * Output, one row per batch doc with ≥ 1 foreign-owned window:
    * (doc_id, owner_doc = the owner holding the most such windows
    * (ties to the smaller owner id), n_shared = that owner's window
    * count, n_foreign_windows = the doc's total). Union semantics
    * match [[scrubProbe]]: batch-internal duplicates attribute to the
    * batch's own min holder, so the report covers intra-shard
    * plagiarism too, not just corpus hits. Cost ∝ shard + matches, as
    * in [[unionOwned]]. */
  def ownerAttribution(spark: SparkSession, batch: DataFrame,
                       name: String, spec: Spec = Spec()): DataFrame = {
    val grams = gramsOf(batch, spec.minLen)
      .select("doc_id", "pos", "gram").persistT // census + foreign join
    val batchCensus = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd_b"), min(col("doc_id")).as("min_b"))
    val foreign = grams.join(
        unionOwned(spark, name, "ownerAttribution", batchCensus), Seq("gram"))
      .where(col("doc_id") =!= col("owner"))
      .persistT // per-owner rollup + per-doc total
    val top = foreign.groupBy(col("doc_id"), col("owner"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("n_shared").desc, col("owner"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("owner").as("owner_doc"), col("n_shared"))
    foreign.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_foreign_windows"))
      .join(top, Seq("doc_id"))
      .select("doc_id", "owner_doc", "n_shared", "n_foreign_windows")
  }

  // ------------------------------------------------------------------
  // index-served span analytics (VERDICT r13 #2)
  // ------------------------------------------------------------------

  /** The standing (gram, source) statistics, segments merged: per-
    * source distinct-doc and occurrence counts for every indexed gram.
    * With a compacted index this is the base table read as stored (no
    * exchange); live deltas add a gram-partitioned min/sum-merge over
    * their (small) rows. The text is never touched — that is the point:
    * every derived span analysis (breadth censuses, the syndication
    * matrix) starts from 16-byte rows instead of re-tokenizing the
    * corpus. */
  def sourceStats(spark: SparkSession, name: String): DataFrame = {
    val segs = segmentTables(spark, name)
    val ts = tombstones(spark, tableName(name))
    if (segs.size == 1 && ts.isEmpty)
      spark.table(segs.head)
        .select("gram", "source", "n_docs", "n_occ")
    else
      // tombstone rows carry NEGATED stats ([[retract]]): the sum-merge
      // nets them and the filter drops fully-retracted (gram, source)
      // rows — exact ≡ rebuild-without-docs (RetractionSpec)
      (segs ++ ts).map(readUnbucketed(spark, _)).reduce(_ unionByName _)
        .groupBy(col("gram"), col("source"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_occ")).cast("long").as("n_occ"))
        .where(col("n_docs") > 0)
  }

  /** The cross-source span-affinity matrix SERVED from the index — the
    * q290 semantics (per source pair: distinct shared gram templates
    * and the occurrence mass behind them, grams broader than
    * `maxSources` excluded from the pair join but counted in
    * `n_wide_templates`) computed without re-reading any text. On a
    * compacted single-segment index the whole derivation up to the
    * pair-grain rollup runs in the base table's bucket layout: breadth
    * census, cap filter and the per-gram pair join all key on `gram`,
    * so the only exchanges are the ≤ |sources|²-row final aggregate
    * and the 1-row wide-template census (GramIndexSpec pins the plan).
    */
  def sourceAffinity(spark: SparkSession, name: String,
                     maxSources: Int = 16): DataFrame = {
    val gs = sourceStats(spark, name)
    val breadth = gs.groupBy(col("gram")).agg(count(lit(1)).as("ns"))
    val narrow = gs.join(
      breadth.where(col("ns") <= maxSources).select("gram"), Seq("gram"), "left_semi")
    val wide = breadth.where(col("ns") > maxSources)
      .agg(count(lit(1)).cast("long").as("n_wide_templates"))
    narrow.select(col("gram"), col("source").as("source_a"), col("n_occ").as("occ_a"))
      .join(narrow.select(col("gram"), col("source").as("source_b"), col("n_occ").as("occ_b")),
        Seq("gram"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_templates"),
        sum(col("occ_a") + col("occ_b")).cast("long").as("n_occurrences"))
      .crossJoin(broadcast(wide))
  }
}

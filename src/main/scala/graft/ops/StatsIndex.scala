package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType, StringType}

/** INCREMENTAL ANALYZE — q198's column-statistics pass maintained as a
  * standing index under appends AND retractions (VERDICT r14 #8), the
  * statistics member of the standing-index family.
  *
  * The sufficient statistic is the MELTED PER-VALUE frame
  * (stat_key, nv, sv, cnt): every q198 output — row/null counts, exact
  * NDV, min/max, the in-plan-verified HLL contract, and the equi-depth
  * histogram — folds from it, and it is a MONOID under row-batch
  * arithmetic: an append contributes positive per-value deltas, a
  * retraction negative ones, and merge-on-read sums them (a value whose
  * net count reaches 0 disappears — exactly what a from-scratch ANALYZE
  * of the final state would see). That is what makes min/max/NDV/HLL —
  * none of which are invertible as scalars — exactly maintainable: the
  * index keeps the value grain they re-derive from, the same trade the
  * gram index makes for substring stats.
  *
  * Layout: a base table `{name}_vals` plus digest-named delta segments
  * `{name}_vals_d<digest>` (appends) / `{name}_vals_r<digest>`
  * (retractions) — the GramIndex naming discipline: segment names are a
  * deterministic digest of their content, written with Overwrite, so a
  * crash-replayed append/retract REWRITES its segment instead of
  * double-counting. [[compact]] folds everything into a fresh base
  * (old-aside rename, crash-safe) and drops net-zero rows.
  *
  * 100 TB shape: append/retract cost ∝ the batch (one melt + one
  * pre-aggregated segment write — standing data never re-read); serving
  * cost is one shuffle of the distinct (stat_key, value) pairs — the
  * same exchange q198's one-shot melt pays, amortized across every
  * probe between compactions. The histogram avoids the single-partition
  * ntile cliff via the distributed prefix scan
  * ([[RelationalOps.globalRunningSum]] over value-grain counts).
  *
  * Contract: retract each row-batch ONCE (the caller names what it
  * removes — same as every takedown path here); replay of the same
  * batch is idempotent by the digest naming. Two legitimately DISTINCT
  * batches with identical melted content (realistic for low-cardinality
  * columns under fixed batch sizes) are indistinguishable from a replay
  * by content alone — callers in that regime MUST pass `batchId`
  * (ADVICE r15 #4), which scopes the idempotency to the batch: same
  * batchId replays overwrite, different batchIds count separately.
  * Single writer per index name, like all index maintenance.
  */
object StatsIndex {

  private def base(name: String) = s"${name}_vals".toLowerCase

  /** Comma-joined segment suffixes a compacted base has already folded
    * — stamped pre-rename, so the instant the swap commits the folded
    * segments stop counting: a crash between the swap and the segment
    * drops cannot double-count (the GramIndex TombProp discipline). */
  private val CoversProp = "graft.coversSegs"

  private def coveredSegs(spark: SparkSession, name: String): Set[String] = {
    val b = base(name)
    if (!spark.catalog.tableExists(b)) Set.empty
    else spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(b))
      .properties.get(CoversProp).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty).toSet
  }

  /** Every segment on disk, INCLUDING covered garbage — cleanup paths
    * use it; readers use [[liveSegTables]]. */
  private def segTables(spark: SparkSession, name: String): Seq[String] = {
    val b = base(name)
    val re = (java.util.regex.Pattern.quote(b) + "_[dr][0-9a-f]+").r
    spark.sessionState.catalog
      .listTables(spark.catalog.currentDatabase, s"${b}_*")
      .map(_.table)
      .filter(t => re.findFirstMatchIn(t).exists(m => m.start == 0 && m.end == t.length))
  }

  private def liveSegTables(spark: SparkSession, name: String): Seq[String] = {
    val covered = coveredSegs(spark, name)
    segTables(spark, name)
      .filterNot(t => covered.contains(t.stripPrefix(s"${base(name)}_")))
  }

  /** Reap covered segments (a crashed [[compact]]'s post-swap garbage):
    * drops first, stamp cleared last — run by the writers so a later
    * batch that reproduces a folded digest gets a fresh LIVE segment
    * instead of being hidden by the stale stamp. */
  private def sweepCovered(spark: SparkSession, name: String): Unit = {
    val covered = coveredSegs(spark, name)
    if (covered.nonEmpty) {
      segTables(spark, name)
        .filter(t => covered.contains(t.stripPrefix(s"${base(name)}_")))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
      spark.sql(s"ALTER TABLE `${base(name)}` SET TBLPROPERTIES ('$CoversProp' = '')")
    }
  }

  /** Self-heal the [[compact]] rename window (ADVICE r15 #5): between
    * its two renames there is no live base — recover by renaming a
    * surviving copy back. `_old` is preferred (consistent with
    * still-visible segments); `_compact` (whose covers stamp hides
    * those segments) is equivalent when `_old` is already gone. */
  private def heal(spark: SparkSession, name: String): Unit = {
    val b = base(name)
    if (!spark.catalog.tableExists(b)) {
      if (spark.catalog.tableExists(s"${b}_old"))
        spark.sql(s"ALTER TABLE `${b}_old` RENAME TO `$b`")
      else if (spark.catalog.tableExists(s"${b}_compact"))
        spark.sql(s"ALTER TABLE `${b}_compact` RENAME TO `$b`")
    }
  }

  /** Sketch-tier machinery (VERDICT r15 #6): the per-value grain is the
    * exactness engine, but for a unique-ish column (doc ids, hashes)
    * the `_vals` table is corpus-sized forever. A column placed in the
    * SKETCH tier at [[write]] contributes O(1) rows per batch instead:
    * summable n / n_null, min/max rows (merge-on-read), and a
    * DataSketches HLL sketch (`hll_union_agg` on read) — so `_vals`
    * growth tracks low-NDV columns only. The price, stated loudly:
    * sketch-tier columns serve ESTIMATED ndv via [[sketchStats]] (never
    * [[columnStats]]'s exact contract), and they CANNOT be retracted —
    * HLL/min/max are not invertible and no value grain exists to
    * re-derive from; [[retract]] refuses (the gram index's
    * stats-exact/fail-loud discipline). */
  private val SkPrefix = "sk:"
  private val TierProp = "graft.sketchKeys"

  /** Sketch-tier stat_keys recorded on the base at [[write]]. */
  def sketchKeys(spark: SparkSession, name: String): Set[String] = {
    val b = base(name)
    if (!spark.catalog.tableExists(b)) Set.empty
    else spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(b))
      .properties.get(TierProp).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty).toSet
  }

  /** Per-value deltas of one melted batch (positive). */
  private def deltasOf(melted: DataFrame): DataFrame =
    melted.groupBy(col("stat_key"), col("nv"), col("sv"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** One batch's segment rows under a tier split: exact keys keep the
    * per-value grain; sketch keys fold to O(1) rows each — `sk:<kind>:
    * <key>` rows in the SAME schema (plus a binary `sk` slot), so a
    * segment stays ONE atomic write. n/null rows sum on read; min/max
    * rows ride the value slots (the per-value merge keeps them, serving
    * takes min/max over them); the HLL row carries the sketch bytes. */
  private def segRowsOf(melted: DataFrame, sketch: Set[String]): DataFrame = {
    val nullB = lit(null).cast(BinaryType)
    val exact = deltasOf(
        if (sketch.isEmpty) melted
        else melted.where(!col("stat_key").isin(sketch.toSeq: _*)))
      .withColumn("sk", nullB)
    if (sketch.isEmpty) exact
    else {
      val nullD = lit(null).cast(DoubleType)
      val nullS = lit(null).cast(StringType)
      val one = lit(1L)
      val sk = melted.where(col("stat_key").isin(sketch.toSeq: _*))
        .groupBy(col("stat_key"))
        .agg(count(lit(1)).cast("long").as("n"),
          coalesce(sum(when(col("nv").isNull && col("sv").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_null"),
          min(col("nv")).as("mn"), max(col("nv")).as("mx"),
          min(col("sv")).as("ms"), max(col("sv")).as("xs"),
          hll_sketch_agg(coalesce(col("nv").cast(StringType), col("sv"))).as("h"))
        .select(col("stat_key").as("k"), col("n"), col("n_null"),
          col("mn"), col("mx"), col("ms"), col("xs"), col("h"))
        .select(explode(array(
          struct(concat(lit(s"${SkPrefix}n:"), col("k")).as("stat_key"),
            nullD.as("nv"), nullS.as("sv"), col("n").as("cnt"), nullB.as("sk")),
          struct(concat(lit(s"${SkPrefix}null:"), col("k")).as("stat_key"),
            nullD.as("nv"), nullS.as("sv"), col("n_null").as("cnt"), nullB.as("sk")),
          struct(concat(lit(s"${SkPrefix}minn:"), col("k")).as("stat_key"),
            col("mn").as("nv"), nullS.as("sv"), one.as("cnt"), nullB.as("sk")),
          struct(concat(lit(s"${SkPrefix}maxn:"), col("k")).as("stat_key"),
            col("mx").as("nv"), nullS.as("sv"), one.as("cnt"), nullB.as("sk")),
          struct(concat(lit(s"${SkPrefix}mins:"), col("k")).as("stat_key"),
            nullD.as("nv"), col("ms").as("sv"), one.as("cnt"), nullB.as("sk")),
          struct(concat(lit(s"${SkPrefix}maxs:"), col("k")).as("stat_key"),
            nullD.as("nv"), col("xs").as("sv"), one.as("cnt"), nullB.as("sk")),
          struct(concat(lit(s"${SkPrefix}hll:"), col("k")).as("stat_key"),
            nullD.as("nv"), nullS.as("sv"), one.as("cnt"), col("h").as("sk")))).as("r"))
        .select(col("r.stat_key"), col("r.nv"), col("r.sv"), col("r.cnt"), col("r.sk"))
      exact.unionByName(sk)
    }
  }

  /** Order-independent content digest of a delta frame — two
    * independent 64-bit xor folds + count (overflow-free), 48 hex
    * chars; the deterministic segment name (GramIndex.idDigest
    * pattern). A non-empty `batchId` seeds both folds, scoping the
    * idempotency to the batch rather than its content (ADVICE r15 #4:
    * distinct same-content batches must not coalesce). */
  private def digestOf(deltas: DataFrame, batchId: String): String = {
    val r = deltas.agg(
      count(lit(1)).cast("long").as("n"),
      coalesce(expr("bit_xor(xxhash64(stat_key, nv, sv, cnt))"), lit(0L)).as("x1"),
      coalesce(expr("bit_xor(xxhash64('s', stat_key, nv, sv, cnt))"), lit(0L)).as("x2")).head()
    val (b1, b2) =
      if (batchId.isEmpty) (0L, 0L)
      else (scala.util.hashing.MurmurHash3.stringHash(batchId).toLong,
        scala.util.hashing.MurmurHash3.stringHash(batchId + "s").toLong)
    String.format("%016x%016x%016x",
      Long.box(r.getLong(0)), Long.box(r.getLong(1) ^ b1), Long.box(r.getLong(2) ^ b2))
  }

  /** Orphaned segment dirs from a dead session (in-memory catalog lost,
    * warehouse dirs survive) would break the deterministic Overwrite
    * names — sweep them on rebuild, as GramIndex does. */
  private def sweepOrphans(spark: SparkSession, name: String): Unit = {
    val dbUri = spark.catalog.getDatabase(spark.catalog.currentDatabase).locationUri
    val dbPath = new org.apache.hadoop.fs.Path(dbUri)
    val fs = dbPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dbPath)) return
    val re = (java.util.regex.Pattern.quote(base(name)) +
      "(_[dr][0-9a-f]+|_compact|_old)?").r
    fs.listStatus(dbPath).foreach { st =>
      val n = st.getPath.getName
      if (re.findFirstMatchIn(n).exists(m => m.start == 0 && m.end == n.length))
        fs.delete(st.getPath, true)
    }
  }

  /** Build (or replace) the index from a melted (stat_key, nv, sv)
    * frame — callers own the melt (which columns, how dates export),
    * exactly as q198 does. `sketch` names the stat_keys kept in the
    * SKETCH tier (high-NDV columns whose per-value grain would be
    * corpus-sized); the choice is recorded on the base and enforced by
    * [[append]]/[[retract]] from then on. */
  def write(melted: DataFrame, name: String,
            sketch: Set[String] = Set.empty): Unit = {
    val spark = melted.sparkSession
    val b = base(name)
    segTables(spark, name).foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Seq(b, s"${b}_compact", s"${b}_old").foreach(t =>
      graft.dedup.SignatureIndex.dropStale(spark, t))
    sweepOrphans(spark, name)
    segRowsOf(melted, sketch).write.mode(SaveMode.Overwrite).saveAsTable(b)
    if (sketch.nonEmpty)
      spark.sql(s"ALTER TABLE `$b` SET TBLPROPERTIES " +
        s"('$TierProp' = '${sketch.mkString(",")}')")
  }

  private def writeSeg(deltas: DataFrame, name: String, kind: String,
                       batchId: String): Unit = {
    val spark = deltas.sparkSession
    heal(spark, name)
    sweepCovered(spark, name)
    val d = deltas.persist() // digest agg + segment write
    try {
      if (d.isEmpty) return
      val t = s"${base(name)}_$kind${digestOf(d, batchId)}"
      graft.dedup.SignatureIndex.dropStale(spark, t) // cross-session replay
      d.write.mode(SaveMode.Overwrite).saveAsTable(t)
    } finally { d.unpersist(); () }
  }

  /** Add a melted batch — one positive delta segment, O(batch); sketch-
    * tier keys (recorded at [[write]]) fold to O(1) rows. Pass a stable
    * `batchId` when distinct batches can carry identical content (see
    * the object contract). */
  def append(melted: DataFrame, name: String, batchId: String = ""): Unit = {
    val sk = sketchKeys(melted.sparkSession, name)
    writeSeg(segRowsOf(melted, sk), name, "d", batchId)
  }

  /** Remove a melted batch — one NEGATED delta segment, O(batch);
    * values the batch fully accounted for net to 0 and vanish from
    * every serve. Same `batchId` contract as [[append]]. REFUSES a
    * batch naming sketch-tier keys: HLL/min/max are not invertible and
    * the sketch tier keeps no value grain to re-derive from — rebuild
    * with [[write]] (fail-loud, never silently wrong). */
  def retract(melted: DataFrame, name: String, batchId: String = ""): Unit = {
    val sk = sketchKeys(melted.sparkSession, name)
    if (sk.nonEmpty) {
      val hit = melted.select(col("stat_key"))
        .where(col("stat_key").isin(sk.toSeq: _*)).limit(1).count()
      require(hit == 0L,
        s"retract on stats index '$name': the batch names SKETCH-tier stat_key(s) " +
          s"(tier members: ${sk.mkString(", ")}) — sketch stats (HLL/min/max) are " +
          "not invertible and no value grain exists to re-derive them from. " +
          "Rebuild with write(); exact-tier keys remain retractable.")
    }
    writeSeg(deltasOf(melted)
      .select(col("stat_key"), col("nv"), col("sv"), (-col("cnt")).as("cnt"))
      .withColumn("sk", lit(null).cast(BinaryType)),
      name, "r", batchId)
  }

  /** Base + live segments, raw (sketch rows included, no merge). */
  private def rawRows(spark: SparkSession, name: String): DataFrame = {
    heal(spark, name)
    val ts = base(name) +: liveSegTables(spark, name)
    ts.map(spark.table).map(df =>
        // pre-tiering tables have no sk column; align for the union
        if (df.columns.contains("sk")) df
        else df.withColumn("sk", lit(null).cast(BinaryType)))
      .reduce(_ unionByName _)
  }

  /** The live per-value frame: all live segments sum-merged, net-zero
    * rows gone — ≡ the melt of a from-scratch ANALYZE of the final
    * state. Heals the compact rename window first; segments a compacted
    * base already folded are excluded ([[CoversProp]]); sketch-tier
    * rows are NOT value grain and are excluded (serve them via
    * [[sketchStats]]). */
  def liveValues(spark: SparkSession, name: String): DataFrame =
    rawRows(spark, name)
      .where(!col("stat_key").startsWith(SkPrefix))
      .groupBy(col("stat_key"), col("nv"), col("sv"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
      .where(col("cnt") > 0)

  /** Sketch-tier serve: per tier member — exact n / n_null / min / max
    * (summable or merge-on-read) and the HLL ndv ESTIMATE (the honest
    * signal of this tier; exact ndv lives only in the exact tier). */
  def sketchStats(spark: SparkSession, name: String): DataFrame = {
    val raw = rawRows(spark, name)
      .where(col("stat_key").startsWith(SkPrefix))
      .select(regexp_extract(col("stat_key"), "^sk:([a-z]+):(.*)$", 1).as("kind"),
        regexp_extract(col("stat_key"), "^sk:([a-z]+):(.*)$", 2).as("stat_key"),
        col("nv"), col("sv"), col("cnt"), col("sk"))
    raw.groupBy(col("stat_key"))
      .agg(
        coalesce(sum(when(col("kind") === "n", col("cnt"))), lit(0L))
          .cast("long").as("n"),
        coalesce(sum(when(col("kind") === "null", col("cnt"))), lit(0L))
          .cast("long").as("n_null"),
        hll_sketch_estimate(
          hll_union_agg(when(col("kind") === "hll", col("sk")), lit(true)))
          .as("ndv_est"),
        min(when(col("kind") === "minn", col("nv"))).as("min_num"),
        max(when(col("kind") === "maxn", col("nv"))).as("max_num"),
        min(when(col("kind") === "mins", col("sv"))).as("min_str"),
        max(when(col("kind") === "maxs", col("sv"))).as("max_str"))
  }

  /** The staleness stamp consumers pair with a serve: how many delta
    * segments stand beyond the last compaction. [[liveValues]] always
    * folds them (serves are CURRENT); a consumer that reads the base
    * alone is "fresh as of the last compact", and this count is its
    * honest distance from now — the contract the advisor family
    * reports next to index-served estimates (q304). */
  def pendingSegments(spark: SparkSession, name: String): Int = {
    heal(spark, name)
    liveSegTables(spark, name).size
  }

  /** q198's per-column scalar rows served from the index — same
    * expressions over the same value grain, so every output (including
    * the HLL-vs-exact-NDV contract boolean) matches the one-shot pass
    * bit-for-bit. */
  def columnStats(spark: SparkSession, name: String): DataFrame =
    liveValues(spark, name)
      .groupBy("stat_key")
      .agg(
        sum(col("cnt")).cast("long").as("n"),
        coalesce(sum(when(col("nv").isNull && col("sv").isNull, col("cnt"))),
          lit(0L)).cast("long").as("n_null"),
        sum(when(col("nv").isNotNull || col("sv").isNotNull, 1L)
          .otherwise(0L)).cast("long").as("ndv"),
        approx_count_distinct(coalesce(col("nv").cast(StringType), col("sv")))
          .as("hll"),
        min(col("nv")).as("min_num"), max(col("nv")).as("max_num"),
        min(col("sv")).as("min_str"), max(col("sv")).as("max_str"))
      .select(col("stat_key"), col("n"), col("n_null"), col("ndv"),
        (abs(col("hll") - col("ndv")) * 100 <= col("ndv") * 15).as("hll_ok"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))

  /** q198's equi-depth histogram served from the index — WITHOUT
    * re-ranking rows: the per-value counts give each value its global
    * rank interval [lo, hi] via the distributed prefix scan, Spark's
    * ntile bucket layout is closed-form arithmetic on (rank, n), and a
    * value straddling a boundary contributes its exact row count to
    * each bucket it intersects. Per-bucket (n, ndv, min, max) equal the
    * row-grain ntile's exactly: equal values are contiguous under
    * (value, tiebreak) order, so the tiebreak only permutes rows WITHIN
    * a value — bucket counts and the set of values touching each bucket
    * are tiebreak-invariant. (Null values, if present, rank first —
    * Spark's asc default; ndv here counts a null value where COUNT
    * (DISTINCT) would not, a documented divergence the q198 fixture
    * never exercises.) */
  def histogram(spark: SparkSession, name: String, histCol: String,
                nBuckets: Int = 8): DataFrame = {
    val hv = liveValues(spark, name)
      .where(col("stat_key") === s"col:$histCol")
      .select(col("nv"), col("cnt"))
    val cum = RelationalOps.globalRunningSum(hv, Seq(col("nv").asc), "cnt",
        "hi", inclusive = true)
      .withColumn("lo", col("hi") - col("cnt") + 1)
    val nRow = hv.agg(coalesce(sum(col("cnt")), lit(0L)).as("n_total"))
    val withN = cum.crossJoin(broadcast(nRow))
    val k = lit(nBuckets.toLong)
    val qSize = floor(col("n_total") / k)
    val rExtra = col("n_total") % k
    val cutoff = rExtra * (qSize + 1)
    // Spark's ntile: the first (n mod k) buckets take ceil(n/k) rows —
    // the q198 closed form, inverted to bucket-of-rank and rank-range
    def bucketOf(r: org.apache.spark.sql.Column) =
      when(r <= cutoff, floor((r - 1) / (qSize + 1)) + 1)
        .otherwise(rExtra + floor((r - cutoff - 1) / greatest(qSize, lit(1L))) + 1)
    def startOf(b: org.apache.spark.sql.Column) =
      when(b <= rExtra, (b - 1) * (qSize + 1) + 1)
        .otherwise(cutoff + (b - 1 - rExtra) * qSize + 1)
    def endOf(b: org.apache.spark.sql.Column) =
      when(b <= rExtra, b * (qSize + 1))
        .otherwise(cutoff + (b - rExtra) * qSize)
    withN
      .withColumn("bucket",
        explode(sequence(bucketOf(col("lo")).cast("long"),
          bucketOf(col("hi")).cast("long"))))
      .withColumn("rows_in",
        least(col("hi"), endOf(col("bucket"))) -
          greatest(col("lo"), startOf(col("bucket"))) + 1)
      .groupBy(col("bucket"))
      .agg(sum(col("rows_in")).cast("long").as("n"),
        count(lit(1)).cast("long").as("ndv"),
        min(col("nv")).as("min_num"), max(col("nv")).as("max_num"))
      .select(
        concat(lit(s"hist:$histCol:"), col("bucket").cast("string")).as("stat_key"),
        col("n"), lit(null: java.lang.Long).as("n_null"), col("ndv"),
        lit(null: java.lang.Boolean).as("hll_ok"), col("min_num"), col("max_num"),
        lit(null: String).as("min_str"), lit(null: String).as("max_str"))
  }

  /** Fold base + segments into a fresh base (net-zero rows physically
    * gone — the reclamation point) with the old-aside crash-safe swap;
    * serving plans are unchanged, only segment fan-in shrinks. The
    * folded segment names are stamped onto the rewrite BEFORE the swap
    * ([[CoversProp]]), so a crash between the swap and the segment
    * drops cannot double-count; [[heal]] recovers the no-live-base
    * instant between the two renames (ADVICE r15 #5). */
  def compact(spark: SparkSession, name: String): Unit = {
    heal(spark, name)
    sweepCovered(spark, name)
    val b = base(name)
    val tmp = s"${b}_compact"
    val old = s"${b}_old"
    graft.dedup.SignatureIndex.dropStale(spark, tmp)
    graft.dedup.SignatureIndex.dropStale(spark, old)
    val sk = sketchKeys(spark, name)
    val folded = liveSegTables(spark, name).map(_.stripPrefix(s"${b}_"))
    // exact tier: the merged per-value frame; sketch tier: each
    // sk:<kind>:<key> family folds to ONE stored row (counts sum,
    // min/max collapse, HLL sketches union)
    val kind = regexp_extract(col("stat_key"), "^sk:([a-z]+):", 1)
    val foldedSketch = rawRows(spark, name)
      .where(col("stat_key").startsWith(SkPrefix))
      .groupBy(col("stat_key"))
      .agg(sum(col("cnt")).cast("long").as("c"),
        min(col("nv")).as("mnv"), max(col("nv")).as("mxv"),
        min(col("sv")).as("msv"), max(col("sv")).as("mxs"),
        hll_union_agg(col("sk"), lit(true)).as("hu"))
      .select(col("stat_key"),
        when(kind === "minn", col("mnv"))
          .when(kind === "maxn", col("mxv")).as("nv"),
        when(kind === "mins", col("msv"))
          .when(kind === "maxs", col("mxs")).as("sv"),
        when(kind.isin("n", "null"), col("c")).otherwise(lit(1L)).as("cnt"),
        when(kind === "hll", col("hu")).as("sk"))
    liveValues(spark, name).withColumn("sk", lit(null).cast(BinaryType))
      .unionByName(foldedSketch)
      .write.mode(SaveMode.Overwrite).saveAsTable(tmp)
    spark.sql(s"ALTER TABLE `$tmp` SET TBLPROPERTIES (" +
      s"'$CoversProp' = '${folded.mkString(",")}'" +
      (if (sk.isEmpty) "" else s", '$TierProp' = '${sk.mkString(",")}'") + ")")
    spark.sql(s"ALTER TABLE `$b` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$b`")
    spark.sql(s"DROP TABLE `$old`")
    segTables(spark, name).foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }
}

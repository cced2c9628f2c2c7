package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions

/** Text-analysis + dedup extension queries over the `documents` fixture
  * (driver mandate; SURVEY.md §2.11). Oracled where DuckDB can express
  * the same computation; hash-based ops (MinHash/SimHash/winnowing use
  * Spark's xxhash64, which DuckDB does not implement) are rows-only.
  */
object TextQueries {
  import ParityQueries.Q

  private def docs0(s: SparkSession, d: String) = Tables.documents(s, d)

  // ------------------------------------------------------- exact dedup
  private def q23(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(docs0(s, d)).orderBy("text_hash")

  private val q23Sql =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // ------------------------------------------------------ token count
  private def q24(s: SparkSession, d: String): DataFrame =
    docs0(s, d)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .orderBy("doc_id")

  private val q24Sql =
    """SELECT doc_id, CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INTEGER) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- quality score
  private def q25(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val nonSpace = TextFunctions.nonSpaceChars(col("text"))
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    docs0(s, d).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        (nonSpace / nTok).as("avg_token_len"),
        (stopHits / nTok).as("stop_ratio"),
        (nTok >= 5 && (stopHits / nTok) <= lit(0.5)).as("is_quality"))
      .orderBy("doc_id")
  }

  private val q25Sql =
    """SELECT doc_id,
      | CAST(len(toks) AS INTEGER) AS n_tokens,
      | length(regexp_replace(text, '\s', '', 'g')) / len(toks) AS avg_token_len,
      | len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) / len(toks) AS stop_ratio,
      | (len(toks) >= 5 AND len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) / len(toks) <= 0.5) AS is_quality
      |FROM (SELECT *, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- corpus statistics
  private def q26(s: SparkSession, d: String): DataFrame =
    docs0(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"),
           sum(col("n_chars")).as("sum_chars"),
           min(col("doc_id")).as("min_doc"),
           max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "source")

  private val q26Sql =
    """SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      | min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ----------------------------------------------------- language ID
  private def q27(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val hits = TextFunctions.LangMarkers.map { case (lang, words) =>
      TextFunctions.hitCount(toks, words).as(s"${lang}_hits")
    }
    docs0(s, d).select(
        Seq(col("doc_id")) ++ hits ++ Seq(
          TextFunctions.langId(toks).as("pred_lang"), col("lang")): _*)
      .orderBy("doc_id")
  }

  private val q27Sql =
    """SELECT doc_id,
      | CAST(len(list_filter(toks, t -> t IN ('the','a','is'))) AS INTEGER) AS en_hits,
      | CAST(len(list_filter(toks, t -> t IN ('data','row','table'))) AS INTEGER) AS es_hits,
      | CAST(len(list_filter(toks, t -> t IN ('join','merge','hash'))) AS INTEGER) AS de_hits,
      | CASE WHEN len(list_filter(toks, t -> t IN ('the','a','is'))) >= len(list_filter(toks, t -> t IN ('data','row','table')))
      |       AND len(list_filter(toks, t -> t IN ('the','a','is'))) >= len(list_filter(toks, t -> t IN ('join','merge','hash')))
      |      THEN 'en'
      |      WHEN len(list_filter(toks, t -> t IN ('data','row','table'))) >= len(list_filter(toks, t -> t IN ('join','merge','hash')))
      |      THEN 'es' ELSE 'de' END AS pred_lang,
      | lang
      |FROM (SELECT *, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------- n-gram Jaccard (adjacent ids)
  /** Exact token-set Jaccard between each doc and its successor —
    * pins the similarity arithmetic against the oracle; the scalable
    * pair *generation* is LSH (q29/q30), whose hashes DuckDB lacks. */
  private def q28(s: SparkSession, d: String): DataFrame = {
    val a = docs0(s, d).select(col("doc_id").as("doc_a"),
      array_distinct(TextFunctions.tokens(col("text"))).as("ta"))
    val b = docs0(s, d).select(col("doc_id").as("doc_b"),
      array_distinct(TextFunctions.tokens(col("text"))).as("tb"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ta"), col("tb"))) /
         size(array_union(col("ta"), col("tb")))).as("jaccard"))
      .orderBy("doc_a")
  }

  private val q28Sql =
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | len(list_intersect(a.toks, b.toks)) / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
      |FROM (SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks FROM documents) a
      |JOIN (SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks FROM documents) b
      |  ON b.doc_id = a.doc_id + 1
      |ORDER BY doc_a""".stripMargin

  // --------------------------------------- MinHash LSH candidate pairs
  // 4 bands × 8 rows: collision probability j^8 per band keeps the
  // candidate set near-linear even on corpora with heavy vocabulary
  // overlap (this fixture's docs all share ~40 tokens — loose bands
  // would make every pair a candidate, an O(n²) blow-up at scale).
  private def q29(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidatePairs(Dedup.minhashSignatures(docs0(s, d), k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7)
      .orderBy("doc_a", "doc_b")

  // -------------------------------------------------- SimHash fingerprint
  private def q30(s: SparkSession, d: String): DataFrame =
    Dedup.simhash(docs0(s, d)).orderBy("doc_id")

  // -------------------------------------------- winnowing fingerprints
  private def q31(s: SparkSession, d: String): DataFrame =
    docs0(s, d).select(col("doc_id"),
        TextFunctions.winnowFingerprints(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fp"),
        array_min(col("fp")).as("min_fp"), array_max(col("fp")).as("max_fp"))
      .orderBy("doc_id")

  // --------------------------------- end-to-end near-dup deduplication
  /** The full dedup pipeline: minhash → LSH candidates → clusters →
    * surviving corpus, reported as kept/dropped counts (hash-dependent ⇒
    * rows-only). */
  private def q48(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, k = 32), bands = 4, rowsPerBand = 8, minEst = 0.9)
    val kept = Dedup.dedupByClusters(docs, Dedup.nearDupClusters(pairs))
    import org.apache.spark.sql.functions.{count, lit}
    kept.agg(count(lit(1)).as("n_kept"))
      .crossJoin(docs.agg(count(lit(1)).as("n_total")))
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q23_dedup_exact",        q23 _, Some(q23Sql)),
    ("q24_token_count",        q24 _, Some(q24Sql)),
    ("q25_text_quality",       q25 _, Some(q25Sql)),
    ("q26_corpus_stats",       q26 _, Some(q26Sql)),
    ("q27_lang_id",            q27 _, Some(q27Sql)),
    ("q28_jaccard_adjacent",   q28 _, Some(q28Sql)),
    ("q29_minhash_lsh_pairs",  q29 _, None),
    ("q30_simhash",            q30 _, None),
    ("q31_winnow_fingerprint", q31 _, None),
    ("q48_neardup_dedup",      q48 _, None))
}

package graft.queries

import graft.ops.TrackedCache.TrackOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.dedup.Dedup
import graft.text.{Hashing, TextFunctions}

/** Text-analysis + dedup extension queries over the `documents` fixture
  * (driver mandate; SURVEY.md §2.11). ALL exactly oracled: the dedup
  * pipeline (MinHash/LSH/SimHash/winnowing/cluster resolution) runs on
  * the engine-wide md5-60 hash (graft.text.Hashing), which DuckDB
  * reproduces bit-for-bit.
  */
object TextQueries {
  import ParityQueries.{Q, SortedOutOps}

  private def docs0(s: SparkSession, d: String) = Tables.documents(s, d)

  // ------------------------------------------------------- exact dedup
  // Group-level output (one row per duplicated hash, a small fraction of the
  // corpus) stays on the single-pass sortedOut: a range sort's boundary
  // sampling would re-execute the aggregation subtree (PlanShapeSpec pin).
  private def q23(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(docs0(s, d)).sortedOut("text_hash")

  private val q23Sql =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // ------------------------------------------------------ token count
  private def q24(s: SparkSession, d: String): DataFrame =
    docs0(s, d)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .sortedOutWide("doc_id")

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
      .sortedOutWide("doc_id")
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
      .sortedOut("lang", "source")

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
      .sortedOutWide("doc_id")
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
      .sortedOutWide("doc_a")
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
  //
  // Exactly oracled: the whole pipeline runs on the engine-wide md5-60
  // hash (graft.text.Hashing), which DuckDB reproduces bit-for-bit —
  // the SQL below re-derives signatures, banding, the bucket cap, and
  // the position-agreement estimate from scratch.
  // Pair-level output (bucketCap-bounded candidate pairs) stays on the
  // single-pass sortedOut: range-sort boundary sampling would run the LSH
  // banding join twice (PlanShapeSpec pin).
  private def q29(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidatePairs(Dedup.minhashSignatures(docs0(s, d), k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7)
      .sortedOut("doc_a", "doc_b")

  /** Shared oracle prefix: k=32 independent seeded md5-60 hashes →
    * minhash signature per doc → 4×8 banding with the bucket-size cap →
    * candidate pairs with position-agreement estimate. Mirrors
    * Dedup.minhashSignatures/minhashCandidatePairs. */
  private def minhashOracleCtes(k: Int, bands: Int, rpb: Int, bucketCap: Int): String =
    s"""toks AS (
       |  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id, i,
       |         min(CAST(concat('0x', substr(md5(concat(i // 4, ':', tok)), (i % 4) * 7 + 1, 7)) AS BIGINT)) AS h
       |  FROM toks CROSS JOIN (SELECT unnest(range($k)) AS i) perm
       |  GROUP BY doc_id, i),
       |sigs AS MATERIALIZED (SELECT doc_id, list(h ORDER BY i) AS sig FROM hs GROUP BY doc_id),
       |banded AS MATERIALIZED (
       |  SELECT doc_id, b,
       |         CAST(concat('0x', substr(md5(concat(b, ':', array_to_string(sig[b*$rpb+1 : b*$rpb+$rpb], ','))), 1, 15)) AS BIGINT) AS bh
       |  FROM sigs CROSS JOIN (SELECT unnest(range($bands)) AS b) bnd),
       |sized AS (SELECT b, bh, count(*) AS n, min(doc_id) AS anchor FROM banded GROUP BY b, bh),
       |small AS (SELECT b, bh FROM sized WHERE n <= $bucketCap),
       |safe AS (SELECT banded.doc_id, banded.b, banded.bh FROM banded JOIN small USING (b, bh)),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |    FROM safe x JOIN safe y USING (b, bh) WHERE x.doc_id < y.doc_id
       |    UNION ALL
       |    SELECT sized.anchor AS doc_a, banded.doc_id AS doc_b
       |    FROM banded JOIN sized USING (b, bh)
       |    WHERE sized.n > $bucketCap AND banded.doc_id != sized.anchor)),
       |est AS (
       |  SELECT doc_a, doc_b,
       |         CAST(list_sum(list_transform(range(1, ${k + 1}), j -> CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END)) AS DOUBLE) / $k AS est_jaccard
       |  FROM cand
       |  JOIN sigs sa ON sa.doc_id = cand.doc_a
       |  JOIN sigs sb ON sb.doc_id = cand.doc_b)""".stripMargin

  private val q29Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)}
       |SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.7
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Connected-component labels for the oracle side WITHOUT the
    * quadratic transitive closure. The previous `reach(a, b)` recursive
    * CTE materialized all-pairs reachability — O(Σ component²) rows —
    * and at sf0.1 the boilerplate families pushed DuckDB past ~80 GB of
    * spill before the engine side had even warmed up (VERDICT r6 item
    * 2: "the oracle stops scaling before the engine does").
    *
    * This replacement is unrolled min-label propagation with pointer
    * jumping, the same discipline the Spark side's distributed
    * `nearDupClusters` fallback uses: every CTE stays O(|nodes| +
    * |edges|) rows. One round = (a) label := min over self + neighbor
    * labels, (b) label := min(label, label's label) — path halving, so
    * `rounds` rounds converge for any component diameter ≤ ~2^rounds.
    * LSH components are overlapping cliques (bucket self-joins) plus
    * anchor stars, so real diameters are single digits; rounds=5
    * covers ≥ 32.
    *
    * Exactness is still guaranteed, not assumed: a final fixpoint
    * probe (`conv`) runs one more propagation and NULLs every cluster
    * label if anything would still change, so a hypothetical
    * non-converged run fails the driver compare LOUDLY instead of
    * shipping a plausible-but-wrong component count.
    *
    * Expects upstream CTEs `nodes(doc_id)` (every pair endpoint) and
    * `edges(a, b)` (symmetrized); emits CTEs ending in
    * `labels(doc_id, cluster)` where cluster = component-min doc_id —
    * the same survivor rule as the union-find. */
  private def componentLabelCtes(rounds: Int = 5): String = {
    val sb = new StringBuilder
    sb.append("lp0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS lbl FROM nodes)")
    var prev = "lp0"
    for (r <- 1 to rounds) {
      sb.append(s""",
         |pr$r AS MATERIALIZED (
         |  SELECT node, min(lbl) AS lbl FROM (
         |    SELECT node, lbl FROM $prev
         |    UNION ALL
         |    SELECT e.b AS node, l.lbl FROM $prev l JOIN edges e ON e.a = l.node) u
         |  GROUP BY node),
         |lp$r AS MATERIALIZED (
         |  SELECT a.node, least(a.lbl, b.lbl) AS lbl
         |  FROM pr$r a JOIN pr$r b ON a.lbl = b.node)""".stripMargin)
      prev = s"lp$r"
    }
    sb.append(s""",
       |conv AS MATERIALIZED (
       |  SELECT count(*) AS n_changed FROM (
       |    SELECT node, min(lbl) AS lbl FROM (
       |      SELECT node, lbl FROM $prev
       |      UNION ALL
       |      SELECT e.b AS node, l.lbl FROM $prev l JOIN edges e ON e.a = l.node) u
       |    GROUP BY node
       |    EXCEPT
       |    SELECT node, lbl FROM $prev) x),
       |labels AS (
       |  SELECT node AS doc_id,
       |         CASE WHEN (SELECT n_changed FROM conv) = 0 THEN lbl END AS cluster
       |  FROM $prev)""".stripMargin)
    sb.toString
  }

  // -------------------------------------------------- SimHash fingerprint
  private def q30(s: SparkSession, d: String): DataFrame =
    Dedup.simhash(docs0(s, d)).sortedOutWide("doc_id")

  private val q30Sql =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM t),
      |bits AS (
      |  SELECT doc_id, b,
      |         CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
      |              THEN (1::BIGINT << b) ELSE 0 END AS bv
      |  FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) bit
      |  GROUP BY doc_id, b)
      |SELECT doc_id, CAST(sum(bv) AS BIGINT) AS simhash
      |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------- winnowing fingerprints
  private def q31(s: SparkSession, d: String): DataFrame =
    docs0(s, d).select(col("doc_id"),
        TextFunctions.winnowFingerprints(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fp"),
        array_min(col("fp")).as("min_fp"), array_max(col("fp")).as("max_fp"))
      .sortedOutWide("doc_id")

  // k=8, w=4 mirror of WinnowFingerprint: char k-gram md5-60 hashes,
  // rolling window-of-4 minimum, fingerprint set = distinct mins (plus
  // the degenerate short-text branches).
  private val q31Sql =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |short AS (
      |  SELECT doc_id, CAST(1 AS INTEGER) AS n_fp,
      |         CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS min_fp,
      |         CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS max_fp
      |  FROM d WHERE n < 8),
      |grams AS (
      |  SELECT doc_id, unnest(range(1, n - 8 + 2)) AS i, text
      |  FROM d WHERE n >= 8),
      |gh AS (
      |  SELECT doc_id, i,
      |         CAST(concat('0x', substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 15)) AS BIGINT) AS h
      |  FROM grams),
      |wm AS (
      |  SELECT doc_id, i, h,
      |         min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
      |         count(*) OVER (PARTITION BY doc_id) AS m
      |  FROM gh),
      |sel AS (
      |  SELECT doc_id, CASE WHEN m < 4 THEN h ELSE wmin END AS v
      |  FROM wm WHERE m < 4 OR i <= m - 3),
      |fps AS (
      |  SELECT doc_id, CAST(count(DISTINCT v) AS INTEGER) AS n_fp,
      |         min(v) AS min_fp, max(v) AS max_fp
      |  FROM sel GROUP BY doc_id)
      |SELECT doc_id, n_fp, min_fp, max_fp FROM fps
      |UNION ALL
      |SELECT doc_id, n_fp, min_fp, max_fp FROM short
      |ORDER BY doc_id""".stripMargin

  // --------------------------------- end-to-end near-dup deduplication
  /** The full dedup pipeline: minhash → LSH candidates → clusters →
    * surviving corpus, reported as kept/dropped counts. Exactly oracled:
    * the SQL recomputes the candidate pairs (md5-60 pipeline) and
    * resolves connected components with a recursive transitive closure —
    * survivor-per-cluster = component min, same as the union-find. */
  private def q48(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, k = 32), bands = 4, rowsPerBand = 8, minEst = 0.9)
    val kept = Dedup.dedupByClusters(docs, Dedup.nearDupClusters(pairs))
    import org.apache.spark.sql.functions.{count, lit}
    kept.agg(count(lit(1)).as("n_kept"))
      .crossJoin(docs.agg(count(lit(1)).as("n_total")))
  }

  private val q48Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |p AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.9),
       |nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
       |${componentLabelCtes()}
       |SELECT
       |  CAST((SELECT count(*) FROM documents) - (SELECT count(*) FROM nodes)
       |       + (SELECT count(DISTINCT cluster) FROM labels) AS BIGINT) AS n_kept,
       |  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_total""".stripMargin

  // --------------------------------------- incremental corpus dedup
  /** The production dedup shape: documents split into a standing
    * CORPUS (19 of every 20 docs) and an arriving BATCH (doc_id % 20
    * == 0, 5%); the batch is deduped against the corpus signature
    * index, then within itself. corpus >> batch at EVERY sf — the r3
    * split (corpus = doc_id < 250) inverted at sf0.1, where the
    * "batch" was 95% of the table and the within-batch self-join
    * dominated, which is not the shape this operator exists to
    * demonstrate. Exactly oracled end-to-end (md5-60 pipeline +
    * recursive components). */
  private def q57(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val batch = docs.where(col("doc_id") % 20 === 0)
    // hash the WHOLE table once and split the signature table — one
    // explode+aggregate instead of two (the oracle does the same); in
    // production corpusSigs is a standing materialized index instead.
    // Unpersist falls to the ContextCleaner (plan is returned lazily).
    val sigs = Dedup.minhashSignatures(docs, k = 32).persistT
    // persistInputs=false: both probe sides are filters of the one
    // persisted table above — re-persisting them only stacked extra
    // materialization barriers (the r3 bench-variance finding)
    val kept = Dedup.dedupIncrementalSigs(batch,
      sigs.where(col("doc_id") % 20 === 0), sigs.where(col("doc_id") % 20 =!= 0),
      bands = 4, rowsPerBand = 8, minEst = 0.9, persistInputs = false)
    kept.agg(count(lit(1)).as("n_kept"))
      .crossJoin(batch.agg(count(lit(1)).as("n_batch")))
  }

  private val q57Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |bb AS (SELECT * FROM banded WHERE doc_id % 20 != 0),
       |ba AS (SELECT * FROM banded WHERE doc_id % 20 = 0),
       |szb AS (SELECT b, bh, count(*) AS n, min(doc_id) AS anchor FROM bb GROUP BY b, bh),
       |smallb AS (SELECT b, bh FROM szb WHERE n <= 1000),
       |candc AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |    FROM ba x JOIN (SELECT bb.* FROM bb JOIN smallb USING (b, bh)) y USING (b, bh)
       |    UNION ALL
       |    SELECT x.doc_id AS doc_a, szb.anchor AS doc_b
       |    FROM ba x JOIN szb USING (b, bh) WHERE szb.n > 1000)),
       |estc AS (
       |  SELECT doc_a,
       |         CAST(list_sum(list_transform(range(1, 33), j -> CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END)) AS DOUBLE) / 32 AS e
       |  FROM candc JOIN sigs sa ON sa.doc_id = candc.doc_a JOIN sigs sb ON sb.doc_id = candc.doc_b),
       |dup AS (SELECT DISTINCT doc_a AS doc_id FROM estc WHERE e >= 0.9),
       |surv AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0
       |         AND doc_id NOT IN (SELECT doc_id FROM dup)),
       |bs AS (SELECT banded.* FROM banded JOIN surv USING (doc_id)),
       |szs AS (SELECT b, bh, count(*) AS n, min(doc_id) AS anchor FROM bs GROUP BY b, bh),
       |smalls AS (SELECT b, bh FROM szs WHERE n <= 1000),
       |safes AS (SELECT bs.* FROM bs JOIN smalls USING (b, bh)),
       |cands AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |    FROM safes x JOIN safes y USING (b, bh) WHERE x.doc_id < y.doc_id
       |    UNION ALL
       |    SELECT szs.anchor AS doc_a, bs.doc_id AS doc_b
       |    FROM bs JOIN szs USING (b, bh)
       |    WHERE szs.n > 1000 AND bs.doc_id != szs.anchor)),
       |p AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |           CAST(list_sum(list_transform(range(1, 33), j -> CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END)) AS DOUBLE) / 32 AS e
       |    FROM cands JOIN sigs sa ON sa.doc_id = cands.doc_a JOIN sigs sb ON sb.doc_id = cands.doc_b) z
       |  WHERE e >= 0.9),
       |nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
       |${componentLabelCtes()}
       |SELECT
       |  CAST((SELECT count(*) FROM surv) - (SELECT count(*) FROM nodes)
       |       + (SELECT count(DISTINCT cluster) FROM labels) AS BIGINT) AS n_kept,
       |  CAST((SELECT count(*) FROM documents WHERE doc_id % 20 = 0) AS BIGINT) AS n_batch""".stripMargin

  // ------------------------------ deterministic stratified sampling
  /** Reproducible training-data subsampling: per-language sample of
    * the 10 smallest doc_id hashes (partitioning-independent, unlike
    * rand()-based sample()) plus a global 20% Bernoulli hash sample
    * count. Exactly oracled — determinism IS the point. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val strat = graft.ops.Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), k = 10)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("min_doc"),
           sum(col("doc_id")).as("sum_doc"))
    val global = graft.ops.Sampling.hashSample(docs, col("doc_id"), 0.2)
      .agg(count(lit(1)).as("n_global"))
    strat.crossJoin(global).orderBy("lang")
  }

  private val q62Sql = {
    val h = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    val frac = (0.2 * (1L << 60).toDouble).toLong
    s"""WITH ranked AS (
       |  SELECT lang, doc_id,
       |         row_number() OVER (PARTITION BY lang ORDER BY $h, CAST(doc_id AS VARCHAR)) AS rn
       |  FROM documents),
       |strat AS (
       |  SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_doc,
       |         CAST(sum(doc_id) AS BIGINT) AS sum_doc
       |  FROM ranked WHERE rn <= 10 GROUP BY lang),
       |gsamp AS (SELECT count(*) AS n_global FROM documents WHERE $h < $frac)
       |SELECT lang, n_sampled, min_doc, sum_doc, n_global
       |FROM strat CROSS JOIN gsamp ORDER BY lang""".stripMargin
  }

  // ------------------------------------ n-gram similarity join (J2+)
  /** The "proper similarity matching" extension of the reference's
    * exact name-equality join (J2): char-3-gram Jaccard self-join over
    * document title lines (first 60 chars), inverted-index shaped with
    * a gram-frequency cap as the skew guard — no cross join. Exactly
    * oracled (pure set arithmetic, no hashes involved). */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d).select(col("doc_id"), substring(col("text"), 1, 60).as("nm"))
    graft.ops.RelationalOps.similarityJoin(
        docs, "doc_id", "nm", docs, "doc_id", "nm",
        minJaccard = 0.6, gramN = 3, gramCap = 600)
      .where(col("l_id") < col("r_id"))
      .sortedOutWide("l_id", "r_id")
  }

  private val q56Sql =
    """WITH d AS (SELECT doc_id, substr(text, 1, 60) AS nm FROM documents),
      |g AS (
      |  SELECT doc_id AS id, unnest(list_distinct(list_transform(
      |    range(1, greatest(length(nm)-2, 1) + 1),
      |    i -> substr(lower(nm), CAST(i AS INTEGER), 3)))) AS gram FROM d),
      |rare AS (SELECT gram FROM (SELECT gram FROM g UNION ALL SELECT gram FROM g) u
      |         GROUP BY gram HAVING count(*) <= 600),
      |gr AS (SELECT g.* FROM g JOIN rare USING (gram)),
      |sz AS (SELECT id, count(*) AS n FROM gr GROUP BY id),
      |pairs AS (SELECT a.id AS l_id, b.id AS r_id, count(*) AS shared
      |          FROM gr a JOIN gr b USING (gram) WHERE a.id < b.id GROUP BY a.id, b.id)
      |SELECT l_id, r_id, CAST(shared AS DOUBLE)/(la.n + lb.n - shared) AS jaccard
      |FROM pairs JOIN sz la ON la.id = l_id JOIN sz lb ON lb.id = r_id
      |WHERE CAST(shared AS DOUBLE)/(la.n + lb.n - shared) >= 0.6
      |ORDER BY l_id, r_id""".stripMargin

  // ------------------------------------- corpus curation (capstone)
  /** The end-to-end LLM training-data curation pipeline in one query:
    * quality filter (q25's contract) → exact dedup (min-id survivor)
    * → MinHash/LSH near-dup dedup (q48's machinery) → per-language
    * corpus counts. Every stage rides the md5-60 hash family, so the
    * whole composition is exactly oracled. */
  private def q60(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val toks = TextFunctions.tokens(col("text"))
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    val quality = docs.where(size(toks) >= 5 && (stopHits / size(toks)) <= lit(0.5))
    val exactKeep = quality.join(
      Dedup.exactGroups(quality).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(exactKeep, k = 32), bands = 4, rowsPerBand = 8, minEst = 0.9)
    val kept = Dedup.dedupByClusters(exactKeep, Dedup.nearDupClusters(pairs))
    kept.groupBy("lang").agg(count(lit(1)).as("n_docs")).sortedOut("lang")
  }

  private val q60Sql =
    s"""WITH qual AS (
      |  SELECT * FROM (
      |    SELECT d.*, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents d) x
      |  WHERE len(tk) >= 5
      |    AND len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is'))) / len(tk) <= 0.5),
      |exact_keep AS (SELECT min(doc_id) AS doc_id FROM qual GROUP BY text),
      |cur AS (SELECT qual.* FROM qual JOIN exact_keep USING (doc_id)),
      |toks AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM cur),
      |hs AS (
      |  SELECT doc_id, i,
      |         min(CAST(concat('0x', substr(md5(concat(i // 4, ':', tok)), (i % 4) * 7 + 1, 7)) AS BIGINT)) AS h
      |  FROM toks CROSS JOIN (SELECT unnest(range(32)) AS i) perm
      |  GROUP BY doc_id, i),
      |sigs AS MATERIALIZED (SELECT doc_id, list(h ORDER BY i) AS sig FROM hs GROUP BY doc_id),
      |banded AS MATERIALIZED (
      |  SELECT doc_id, b,
      |         CAST(concat('0x', substr(md5(concat(b, ':', array_to_string(sig[b*8+1 : b*8+8], ','))), 1, 15)) AS BIGINT) AS bh
      |  FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bnd),
      |sized AS (SELECT b, bh, count(*) AS n, min(doc_id) AS anchor FROM banded GROUP BY b, bh),
      |small AS (SELECT b, bh FROM sized WHERE n <= 1000),
      |safe AS (SELECT banded.doc_id, banded.b, banded.bh FROM banded JOIN small USING (b, bh)),
      |cand AS (
      |  SELECT DISTINCT doc_a, doc_b FROM (
      |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      |    FROM safe x JOIN safe y USING (b, bh) WHERE x.doc_id < y.doc_id
      |    UNION ALL
      |    SELECT sized.anchor AS doc_a, banded.doc_id AS doc_b
      |    FROM banded JOIN sized USING (b, bh)
      |    WHERE sized.n > 1000 AND banded.doc_id != sized.anchor)),
      |p AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT doc_a, doc_b,
      |           CAST(list_sum(list_transform(range(1, 33), j -> CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END)) AS DOUBLE) / 32 AS e
      |    FROM cand JOIN sigs sa ON sa.doc_id = cand.doc_a JOIN sigs sb ON sb.doc_id = cand.doc_b) z
      |  WHERE e >= 0.9),
      |nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u),
      |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
      |${componentLabelCtes()},
      |kept AS (
      |  SELECT doc_id FROM cur WHERE doc_id NOT IN (SELECT doc_id FROM nodes)
      |  UNION ALL
      |  SELECT doc_id FROM labels WHERE cluster = doc_id)
      |SELECT lang, count(*) AS n_docs
      |FROM cur JOIN kept USING (doc_id)
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------- BM25 top-k (q63)
  /** BM25 relevance of every document against a fixed three-term query
    * ("join stream vector"): Robertson idf ln(1 + (N-df+0.5)/(df+0.5)),
    * k1 = 1.2, b = 0.75, summed per term in a fixed order.
    *
    * Scale shape: tf and doclen are narrow per-row projections; corpus
    * stats (N, Σlen, the three dfs) are ONE single-row aggregate
    * broadcast back; top-20 plans as TakeOrderedAndProject — no global
    * sort shuffle at any size.
    *
    * Oracle note: ln() is only 1-ulp reproducible across engines, so
    * the double score itself is not hashable. The fixture's adjacent
    * top-30 score gaps are ≥ 3e-5 at both sf0.001 and sf0.01 (measured)
    * — vastly above ulp noise — so the RANKING is engine-stable; the
    * query outputs only the integer columns of the top-20 rows. */
  private def q63(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("join", "stream", "vector")
    val toks = TextFunctions.tokens(col("text"))
    // tf feeds the stats aggregate AND the scoring projection —
    // persist, or the tokenize+count scan runs twice (unpersist falls
    // to the ContextCleaner; the frame is (id, 4 ints) per doc)
    val tf = docs0(s, d).select(
      col("doc_id") +: size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).as(s"tf$i") }: _*)
      .persistT
    val stats = tf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_len"),
      count(when(col("tf0") > 0, 1)).as("df0"),
      count(when(col("tf1") > 0, 1)).as("df1"),
      count(when(col("tf2") > 0, 1)).as("df2"))
    // one BM25 term — the shared tree (TextFunctions.bm25Part) q113's
    // standing-index probe must reproduce bit-for-bit
    def part(tfc: Column, dfc: Column): Column =
      TextFunctions.bm25Part(tfc, dfc, col("dl"), col("n_docs"), col("sum_len"))
    val score = part(col("tf0"), col("df0")) +
      part(col("tf1"), col("df1")) + part(col("tf2"), col("df2"))
    tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl").as("n_tokens"),
        col("tf0").as("tf_join"), col("tf1").as("tf_stream"),
        col("tf2").as("tf_vector"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
      .drop("score")
  }

  private val q63Sql =
    """SELECT doc_id, n_tokens, tf_join, tf_stream, tf_vector FROM (
      |  WITH d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |  tf AS (SELECT doc_id, CAST(len(tk) AS INTEGER) AS n_tokens,
      |           CAST(len(list_filter(tk, t -> t = 'join')) AS INTEGER) AS tf_join,
      |           CAST(len(list_filter(tk, t -> t = 'stream')) AS INTEGER) AS tf_stream,
      |           CAST(len(list_filter(tk, t -> t = 'vector')) AS INTEGER) AS tf_vector
      |         FROM d),
      |  st AS (SELECT count(*) AS n_docs, sum(n_tokens) AS sum_len,
      |           count(CASE WHEN tf_join > 0 THEN 1 END) AS df0,
      |           count(CASE WHEN tf_stream > 0 THEN 1 END) AS df1,
      |           count(CASE WHEN tf_vector > 0 THEN 1 END) AS df2
      |         FROM tf)
      |  SELECT doc_id, n_tokens, tf_join, tf_stream, tf_vector,
      |      ln(CAST(n_docs - df0 + 0.5 AS DOUBLE)/CAST(df0 + 0.5 AS DOUBLE) + 1.0)*tf_join*2.2/(tf_join + 1.2*(0.25 + 0.75*(n_tokens*n_docs)/CAST(sum_len AS DOUBLE)))
      |    + ln(CAST(n_docs - df1 + 0.5 AS DOUBLE)/CAST(df1 + 0.5 AS DOUBLE) + 1.0)*tf_stream*2.2/(tf_stream + 1.2*(0.25 + 0.75*(n_tokens*n_docs)/CAST(sum_len AS DOUBLE)))
      |    + ln(CAST(n_docs - df2 + 0.5 AS DOUBLE)/CAST(df2 + 0.5 AS DOUBLE) + 1.0)*tf_vector*2.2/(tf_vector + 1.2*(0.25 + 0.75*(n_tokens*n_docs)/CAST(sum_len AS DOUBLE))) AS score
      |  FROM tf, st
      |  ORDER BY score DESC, doc_id LIMIT 20) z""".stripMargin

  // -------------------------------------- BPE-style token count (q66)
  /** The second driver-mandated token counter: BPE-style
    * pretokenization (letter runs | digit runs | single symbol) next
    * to the whitespace count, plus non-space chars per BPE token — the
    * compression-ratio proxy quality filters threshold on. Narrow
    * per-row projection; the regex stays in the Java-regex ∩ RE2
    * subset so both engines tokenize identically. */
  private def q66(s: SparkSession, d: String): DataFrame = {
    // nullif guard: an empty/whitespace-only doc has zero BPE tokens —
    // the ratio must be NULL on both engines, not an ANSI
    // divide-by-zero (Spark) vs inf/nan (DuckDB)
    val nBpe = TextFunctions.bpeTokenCount(col("text"))
    docs0(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
        nBpe.as("n_bpe_tokens"),
        (TextFunctions.nonSpaceChars(col("text")) /
          nullif(nBpe, lit(0))).as("chars_per_bpe"))
      .sortedOutWide("doc_id")
  }

  private val q66Sql =
    """SELECT doc_id,
      | CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INTEGER) AS n_ws_tokens,
      | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
      | length(regexp_replace(text, '\s', '', 'g')) / NULLIF(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')), 0) AS chars_per_bpe
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------- token-budget sharding (q70)
  /** Training-shard packing: contiguous 4096-token-quota shards over
    * the corpus in doc_id order, via the DISTRIBUTED prefix sum in
    * [[graft.text.Packing]] (per-partition totals to the driver, two
    * narrow passes — not the single-partition global window the
    * oracle's SQL uses; both produce the identical manifest). */
  private def q70(s: SparkSession, d: String): DataFrame = {
    val withTokens = docs0(s, d)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
    graft.text.Packing.shardManifest(withTokens, "doc_id", "n_tok", budget = 4096L)
  }

  private val q70Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tok,
      |         sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS before
      |  FROM t)
      |SELECT CAST(floor(before / 4096) AS BIGINT) AS shard,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY shard""".stripMargin

  // ------------------ concat-and-chunk sequence packing (q128)
  /** GPT-style pretraining packing: the corpus token stream in doc_id
    * order cut into EXACT 2048-token sequences, documents crossing
    * boundaries — [[graft.text.Packing.fixedLengthSequences]] (the
    * third member of the packing family: q70 budgets shards, q122 pads
    * batches, this one concatenates). Reported as the histogram a
    * data-loader audit reads: how many sequences span 1, 2, … docs and
    * how many document starts (attention-reset points) each class
    * carries. Distributed prefix sum + one narrow explode; pure
    * integer arithmetic, exactly oracled. */
  private def q128(s: SparkSession, d: String): DataFrame = {
    val withTokens = docs0(s, d)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
    graft.text.Packing.fixedLengthSequences(withTokens, "doc_id", "n_tok", seqLen = 2048L)
      .groupBy("n_docs")
      .agg(count(lit(1)).as("n_seqs"),
           sum(col("n_docs_started")).as("sum_started"))
      .sortedOut("n_docs")
  }

  private val q128Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tok,
      |         CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok
      |              AS BIGINT) AS before
      |  FROM t),
      |s AS (
      |  SELECT doc_id, before // 2048 AS first_seq,
      |         unnest(range(before // 2048, (before + n_tok - 1) // 2048 + 1)) AS seq_id
      |  FROM c WHERE n_tok > 0),
      |perseq AS (
      |  SELECT seq_id, count(*) AS n_docs,
      |         sum(CASE WHEN first_seq = seq_id THEN 1 ELSE 0 END) AS n_started
      |  FROM s GROUP BY seq_id)
      |SELECT n_docs, count(*) AS n_seqs, CAST(sum(n_started) AS BIGINT) AS sum_started
      |FROM perseq GROUP BY n_docs ORDER BY n_docs""".stripMargin

  // ------------------- TF-IDF keyword extraction (q130)
  /** Top-3 characteristic terms per document (doc_id < 100 probe set)
    * by a df-penalized term frequency — `score = tf·10⁶ div (df+1)`,
    * the INTEGER-exact member of the tf-idf family: `tf·ln(N/df)`
    * ranks near-identically but `ln` is only 1-ulp portable across
    * engines, and an exactly-oracled ranking beats a prettier float
    * one here (the BM25 surface q63/q113 already covers the float
    * scoring regime). df is corpus-wide; selection rides the native
    * [[graft.plans.TopKPerKey]] bounded-heap plan — per (doc,
    * partition) heaps, ONE shuffle of ≤3 rows per doc, no window over
    * the full scored frame. */
  private def q130(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persistT // feeds corpus-wide df AND the probe-side scoring
    val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.where(col("doc_id") < 100)
      .join(dfx, Seq("term"))
      .withColumn("score", expr("(tf * 1000000) div (df + 1)"))
    graft.plans.TopKPerKey.topK(scored, Seq("doc_id"),
        Seq(col("score").desc, col("term").asc), k = 3)
      .select("doc_id", "term", "tf", "df", "score")
      .sortedOut("doc_id", "term")
  }

  private val q130Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df, (tf.tf * 1000000) // (dfx.df + 1) AS score
      |  FROM tf JOIN dfx USING (term) WHERE tf.doc_id < 100),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM sc)
      |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |       CAST(score AS BIGINT) AS score
      |FROM r WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin

  // ------------------------ per-source curation scorecard (q132)
  /** The report a curation run publishes per ingest source: document
    * count, redundant exact-copies (non-survivors of the exact-dedup
    * groups), language spread, total token volume, duplicate fraction.
    * One groupBy over docs left-semi-flagged by the survivor set —
    * both shuffles on well-distributed keys; dup_pct is a single IEEE
    * division. Exactly oracled. */
  private def q132(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val surv = Dedup.exactGroups(docs)
      .select(col("keep_id").as("doc_id"), lit(1L).as("is_surv"))
    docs.join(surv, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("is_surv").isNull, 1L).otherwise(0L)).as("n_dup"),
           countDistinct(col("lang")).as("n_langs"),
           sum(TextFunctions.tokenCount(col("text")).cast("long")).as("sum_tokens"))
      .withColumn("dup_pct",
        col("n_dup").cast("double") / col("n_docs").cast("double"))
      .sortedOut("source")
  }

  private val q132Sql =
    """WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
      |SELECT d.source,
      |       count(*) AS n_docs,
      |       CAST(sum(CASE WHEN s.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |       CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
      |       CAST(sum(len(regexp_split_to_array(lower(trim(d.text)), '\s+'))) AS BIGINT) AS sum_tokens,
      |       CAST(sum(CASE WHEN s.doc_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS dup_pct
      |FROM documents d LEFT JOIN surv s USING (doc_id)
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  // ------------------------- leak-free train/val split (q133)
  /** Eval-split decontamination at split time: documents are split
    * train/val (90/10) BY NEAR-DUP CLUSTER, not by document — the
    * whole minhash component travels together, so a val doc can never
    * have a near-duplicate in train (the self-inflicted leakage a
    * doc-keyed split guarantees on a corpus with duplicates).
    * Composition of oracled machinery: LSH pairs (minEst 0.9) →
    * connected components → component label as the split-hash group
    * ([[graft.ops.Sampling.groupSplit]]). The output carries the
    * CONTRACT column `n_straddling` (clusters seen in >1 split) that
    * both engines compute independently — 0 by construction, and a
    * bug in either side's clustering or split hashing breaks the
    * match. */
  private def q133(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, k = 32), bands = 4, rowsPerBand = 8, minEst = 0.9)
    val clusters = Dedup.nearDupClusters(pairs)
    val withCl = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cl", coalesce(col("cluster"), col("doc_id")))
    val split = graft.ops.Sampling.groupSplit(withCl, col("cl"),
      Seq("train" -> 0.9, "val" -> 0.1), seed = 42)
    val straddle = split.groupBy("cl")
      .agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") > 1)
      .agg(count(lit(1)).as("n_straddling"))
    split.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("cl")).as("n_groups"))
      .crossJoin(broadcast(straddle))
      .sortedOut("split")
  }

  private val q133Sql = {
    val hv = graft.text.Hashing.duckH60("concat('42:', CAST(cl AS VARCHAR))")
    val b0 = (0.9 * (1L << 60).toDouble).toLong
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |p AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.9),
       |nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
       |${componentLabelCtes()},
       |clx AS (
       |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cl
       |  FROM documents d LEFT JOIN labels l USING (doc_id)),
       |sp AS (
       |  SELECT doc_id, cl,
       |         CASE WHEN $hv < $b0 THEN 'train' ELSE 'val' END AS split
       |  FROM clx),
       |str AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_straddling FROM (
       |    SELECT cl FROM sp GROUP BY cl HAVING count(DISTINCT split) > 1) x)
       |SELECT split, count(*) AS n_docs,
       |       CAST(count(DISTINCT cl) AS BIGINT) AS n_groups, n_straddling
       |FROM sp CROSS JOIN str
       |GROUP BY split, n_straddling ORDER BY split""".stripMargin
  }

  // ------------------------------------ mixture sampling (q71)
  /** Training-mix weighting: per-language Bernoulli fractions in one
    * narrow deterministic filter (en 80%, de 30%, others dropped) —
    * the dataset-mixing step, exactly reproducible because the keep
    * decision is a pure hash of the row key. */
  private def q71(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.mixtureSample(docs0(s, d), col("lang"), col("doc_id"),
        Map("en" -> 0.8, "de" -> 0.3))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
           sum(col("doc_id")).as("sum_doc"))
      .orderBy("lang")

  private val q71Sql = {
    val h = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    val en = (0.8 * (1L << 60).toDouble).toLong
    val de = (0.3 * (1L << 60).toDouble).toLong
    s"""SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_doc
       |FROM documents
       |WHERE (lang = 'en' AND $h < $en) OR (lang = 'de' AND $h < $de)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // -------------------- temperature-scaled mixture sampling (q127)
  /** The standard LLM data-mix knob (VERDICT r6 item 6): per-language
    * keep fractions derived from countᵅ at α = 0.5 (up-weights small
    * languages the way multilingual mixes do) with a 1500-row target,
    * layered on the same deterministic hash filter as q71. Exactly
    * oracled: counts are exact int64, the fraction chain is a pinned
    * left fold over strata sorted ascending, and α = 0.5 uses only
    * IEEE-exact sqrt — DuckDB reproduces every threshold bit-for-bit
    * ([[graft.ops.Sampling.temperatureFractions]]). */
  private def q127(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.temperatureMixtureSample(
        docs0(s, d), col("lang"), col("doc_id"), alpha = 0.5, targetRows = 1500L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
           sum(col("doc_id")).as("sum_doc"))
      .orderBy("lang")

  private val q127Sql = {
    val h = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    // 1152921504606846976.0 = 2^60 exactly — the engine's hash space
    s"""WITH counts AS (SELECT lang AS s, count(*) AS n FROM documents GROUP BY lang),
       |z AS (SELECT list_sum(list(sqrt(CAST(n AS DOUBLE)) ORDER BY s)) AS z FROM counts),
       |fr AS (
       |  SELECT s,
       |         CAST(floor(least(1.0, 1500.0 * sqrt(CAST(n AS DOUBLE)) / z / CAST(n AS DOUBLE))
       |                    * 1152921504606846976.0) AS BIGINT) AS thr
       |  FROM counts CROSS JOIN z)
       |SELECT d.lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_doc
       |FROM documents d JOIN fr ON fr.s = d.lang
       |WHERE $h < fr.thr
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  // ------------------------------ exact substring dedup stats (q72)
  /** Duplicated 13-gram positions per document — exact-substring
    * dedup's curation signal (how much of a doc is verbatim-shared
    * with the rest of the corpus), plus the flag a cleaning pass
    * would threshold on. Grams ride the md5-60 hash family, so the
    * whole computation is exactly oracled. */
  private def q72(s: SparkSession, d: String): DataFrame =
    Dedup.duplicatedNgramStats(docs0(s, d), n = 13)
      .select(col("doc_id"), col("n_grams"), col("n_dup_positions"),
        (col("n_dup_positions") * lit(10) >= col("n_grams") * lit(3)).as("heavy_dup"))
      .sortedOutWide("doc_id")

  private val q72Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(tk) - 11),
      |          i -> CAST(concat('0x', substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 15)) AS BIGINT))) AS gh
      |      FROM t WHERE len(tk) >= 13),
      |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
      |per_doc AS (SELECT doc_id, count(*) AS n_dup_positions FROM g JOIN dup USING (gh) GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(greatest(len(tk) - 12, 0) AS INTEGER) AS n_grams,
      |  CAST(coalesce(n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
      |  coalesce(n_dup_positions, 0) * 10 >= greatest(len(tk) - 12, 0) * 3 AS heavy_dup
      |FROM t LEFT JOIN per_doc ON per_doc.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ------------------------------------ PII-style redaction (q73)
  /** Regex scrubbing with audit counts — the PII-removal pass of a
    * curation pipeline. The fixture text is synthetic word salad, so
    * the "sensitive term" rule is the live one; the email/number rules
    * exercise the same plumbing with zero hits (real pipelines swap in
    * real PII patterns — the operator is identical). The redacted text
    * is exported as its md5 so the full replacement semantics are
    * hashed without shipping 100 TB of scrubbed text to the oracle. */
  private val RedactRules = Seq(
    ("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{4,}\\b", "<NUM>"),
    ("\\bcustomer\\b", "<NAME>"))

  private def q73(s: SparkSession, d: String): DataFrame =
    docs0(s, d).select(col("doc_id"),
        TextFunctions.matchCount(col("text"), RedactRules(0)._1).as("n_email"),
        TextFunctions.matchCount(col("text"), RedactRules(1)._1).as("n_num"),
        TextFunctions.matchCount(col("text"), RedactRules(2)._1).as("n_name"),
        md5(TextFunctions.redact(col("text"), RedactRules).cast("binary")).as("redacted_hash"))
      .sortedOutWide("doc_id")

  private val q73Sql =
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_email,
      | CAST(len(regexp_extract_all(text, '\b[0-9]{4,}\b')) AS INTEGER) AS n_num,
      | CAST(len(regexp_extract_all(text, '\bcustomer\b')) AS INTEGER) AS n_name,
      | md5(regexp_replace(regexp_replace(regexp_replace(text,
      |   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |   '\b[0-9]{4,}\b', '<NUM>', 'g'),
      |   '\bcustomer\b', '<NAME>', 'g')) AS redacted_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------- train/test decontamination (q74)
  /** Decontamination against a benchmark set (here: doc_id % 10 = 0
    * stands in for the eval suite): corpus docs sharing any verbatim
    * 13-gram with the benchmark are flagged. Same hashed-gram family
    * as q72, so the whole check is exactly oracled. */
  private def q74(s: SparkSession, d: String): DataFrame = {
    val all = docs0(s, d)
    Dedup.contaminationStats(
        all.where(col("doc_id") % 10 =!= 0),
        all.where(col("doc_id") % 10 === 0), n = 13)
      .sortedOutWide("doc_id")
  }

  private val q74Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(tk) - 11),
      |          i -> CAST(concat('0x', substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 15)) AS BIGINT))) AS gh
      |      FROM t WHERE len(tk) >= 13),
      |bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % 10 = 0),
      |hits AS (SELECT doc_id, count(*) AS n_bench_hits
      |         FROM g JOIN bench USING (gh) WHERE doc_id % 10 != 0 GROUP BY doc_id)
      |SELECT t.doc_id, CAST(greatest(len(tk) - 12, 0) AS INTEGER) AS n_grams,
      |  CAST(coalesce(n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
      |  coalesce(n_bench_hits, 0) > 0 AS contaminated
      |FROM t LEFT JOIN hits USING (doc_id) WHERE t.doc_id % 10 != 0
      |ORDER BY t.doc_id""".stripMargin

  // ----------------------- repetition quality (Gopher rules) (q75)
  /** Per-doc repetition fractions + the is_repetitive flag
    * ([[graft.text.QualityOps.repetitionStats]]); thresholds chosen to
    * split the fixture corpus non-trivially. */
  private def q75(s: SparkSession, d: String): DataFrame =
    graft.text.QualityOps.repetitionStats(docs0(s, d)).sortedOutWide("doc_id")

  private val q75Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS g FROM t),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
      |       FROM t WHERE len(tk) >= 2),
      |tc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY 1, 2),
      |tp AS (SELECT doc_id, max(c) AS top_tok, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS nd_tok FROM tc GROUP BY 1),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |bp AS (SELECT doc_id, max(c) AS top_bg, CAST(sum(c) AS BIGINT) AS n_bg, count(*) AS nd_bg FROM bc GROUP BY 1)
      |SELECT doc_id,
      |  top_tok / n_tok AS top_token_frac,
      |  1 - nd_tok / n_tok AS dup_token_frac,
      |  top_bg / n_bg AS top_bigram_frac,
      |  (top_tok / n_tok > 0.12 OR 1 - nd_tok / n_tok > 0.6 OR top_bg / n_bg > 0.06) AS is_repetitive
      |FROM tp JOIN bp USING (doc_id) ORDER BY doc_id""".stripMargin

  // -------------------------- vocabulary build + encode (q79)
  /** [[graft.text.Vocab]]: deterministic top-30 vocabulary, documents
    * re-encoded as id arrays (OOV → -1, positions preserved), per-doc
    * OOV rate — the tokenize-for-training step after curation. The id
    * array is exported comma-joined: arrow renders Spark and DuckDB
    * list types with different inner field names, so a raw list column
    * can never type-match the oracle. */
  private def q79(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    graft.text.Vocab.encode(docs, graft.text.Vocab.build(docs, maxSize = 30))
      .select(col("doc_id"),
        array_join(col("ids").cast("array<string>"), ",").as("ids"),
        col("n_tokens"), col("n_oov"), col("oov_rate"))
      .sortedOutWide("doc_id")
  }

  private val q79Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |gi AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM t),
      |g AS (SELECT doc_id, i, tk[i] AS token FROM gi),
      |vc AS (SELECT token, count(*) AS n FROM g GROUP BY token),
      |vocab AS (SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS INTEGER) AS id
      |          FROM vc ORDER BY n DESC, token LIMIT 30),
      |enc AS (SELECT doc_id,
      |          array_to_string(list(CAST(coalesce(id, -1) AS INTEGER) ORDER BY i), ',') AS ids,
      |          count(*) AS n_tokens,
      |          CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |        FROM g LEFT JOIN vocab USING (token) GROUP BY doc_id)
      |SELECT doc_id, ids, n_tokens, n_oov, n_oov / n_tokens AS oov_rate
      |FROM enc ORDER BY doc_id""".stripMargin

  // ------------------- Count-Min sketch heavy hitters (q81)
  /** [[graft.functions.CountMin.heavyHitters]] over the token stream:
    * exact top-10 tokens plus the CMS two-sided estimate contract
    * (q46/q55 sketch pattern — the noisy estimate stays out of the
    * hashed columns; the oracle asserts the booleans). At ε = 1e-4
    * the sketch width (2/ε) dwarfs the fixture vocabulary, so the
    * contract is deterministic, not probabilistic, at every SF. */
  private def q81(s: SparkSession, d: String): DataFrame =
    graft.functions.CountMin.heavyHitters(
        docs0(s, d).select(explode(TextFunctions.tokens(col("text"))).as("tok")),
        "tok", k = 10)
      .sortedOut(col("exact_n").desc, col("tok"))

  private val q81Sql =
    """SELECT tok, count(*) AS exact_n, true AS est_at_least_exact, true AS est_within_eps
      |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok FROM documents) u
      |GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 10""".stripMargin

  // -------------------------- standing signature index probe (q86)
  /** q57's corpus-vs-batch candidate stage served from the STANDING
    * [[graft.dedup.SignatureIndex]]: the corpus (19/20 of docs) is
    * materialized as bucketed tables, the 5% batch probes it — the
    * bucketed layout means the index side never exchanges
    * (SignatureIndexSpec pins that plan shape); only the arriving
    * batch shuffles into the index's bucketing. Output is the verified
    * candidate pair list, exactly the oracle's candc/estc stage.
    *
    * Cardinality note: this output stays on the single-task
    * [[ParityQueries.sortedOut]] DELIBERATELY — it is O(probe batch),
    * and the incremental-dedup contract keeps arriving batches small
    * relative to the corpus (here 5%). A range sort would re-execute
    * the zero-Exchange probe join in its boundary-sampling pass (the
    * measured 2× this convention exists to avoid). */
  private def q86(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val sigs = Dedup.minhashSignatures(docs, k = 32).persistT
    val spec = graft.dedup.SignatureIndex.Spec(bands = 4, rowsPerBand = 8, buckets = 8)
    // build the index ONCE per (session, sf) — the serving contract is
    // "maintained once, probed by every arriving batch", so the timed
    // surface is the PROBE; name is per-sf so switching fixtures can
    // never probe a stale corpus (cross-session leftovers are handled
    // by write's dropStale). Index = 95% of docs, batch = 5% — the
    // corpus >> batch shape the operator exists for (same split as q57)
    val name = "q86_sigidx_" + new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
    // both index tables must exist — a write that died between the
    // banded and sigs saves must be retried, not skipped forever
    if (!s.catalog.tableExists(name + "_banded") || !s.catalog.tableExists(name + "_sigs"))
      graft.dedup.SignatureIndex.write(sigs.where(col("doc_id") % 20 =!= 0), name, spec)
    ParityQueries.sortedOut(
      graft.dedup.SignatureIndex.probe(s, sigs.where(col("doc_id") % 20 === 0),
        name, spec, minEst = 0.9),
      col("doc_a"), col("doc_b"))
  }

  private val q86Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |bb AS (SELECT * FROM banded WHERE doc_id % 20 != 0),
       |ba AS (SELECT * FROM banded WHERE doc_id % 20 = 0),
       |szb AS (SELECT b, bh, count(*) AS n, min(doc_id) AS anchor FROM bb GROUP BY b, bh),
       |smallb AS (SELECT b, bh FROM szb WHERE n <= 1000),
       |candc AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |    FROM ba x JOIN (SELECT bb.* FROM bb JOIN smallb USING (b, bh)) y USING (b, bh)
       |    UNION ALL
       |    SELECT x.doc_id AS doc_a, szb.anchor AS doc_b
       |    FROM ba x JOIN szb USING (b, bh) WHERE szb.n > 1000)),
       |estc AS (
       |  SELECT doc_a, doc_b,
       |         CAST(list_sum(list_transform(range(1, 33), j -> CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END)) AS DOUBLE) / 32 AS est_jaccard
       |  FROM candc JOIN sigs sa ON sa.doc_id = candc.doc_a JOIN sigs sb ON sb.doc_id = candc.doc_b)
       |SELECT doc_a, doc_b, est_jaccard FROM estc WHERE est_jaccard >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------- compression-ratio quality signal (q89)
  /** deflate(text)/|text| per document ([[graft.text.DeflateRatio]]) —
    * the character-level quality proxy next to q75's token-level
    * repetition fractions. The ratio value is zlib-implementation-
    * dependent, so the oracle asserts bounded CONTRACTS (the q46/q55
    * sketch discipline): ratio ∈ (0, 1.5] for docs of ≥ 32 chars
    * (deflate's worst case is the ~11-byte header + 5 bytes/16 KiB
    * block over incompressible input, so (n+11)/n ≤ 1.35 from 32
    * chars up), and every doc of ≥ 256 chars compresses below 1.0
    * (word streams over a small vocabulary always do; the sf0.1 sweep
    * showed a 65-char doc CAN sit at ratio ≥ 1.0, which is why the
    * exemption threshold is 256, not 64). Short docs are exempted
    * rather than clamped so an EMPTY doc's NULL ratio can't poison a
    * boolean the oracle asserts as literal true. */
  private def q89(s: SparkSession, d: String): DataFrame = {
    val ratio = org.apache.spark.sql.GraftSqlShim.column(
      graft.text.DeflateRatio(
        org.apache.spark.sql.GraftSqlShim.expression(col("text"))))
    // both contracts carry a short-doc exemption: a sub-32-char doc can
    // exceed the 1.5 bound on header overhead alone ((n+11)/n), and an
    // EMPTY doc has a NULL ratio that would poison the boolean where
    // the oracle asserts literal true — `true || null` short-circuits
    docs0(s, d).select(col("doc_id"), col("n_chars"),
        (col("n_chars") < 32 || (ratio > 0.0 && ratio <= 1.5)).as("ratio_in_bounds"),
        (col("n_chars") < 256 || ratio < 1.0).as("compresses"))
      .sortedOutWide("doc_id")
  }

  private val q89Sql =
    """SELECT doc_id, n_chars, true AS ratio_in_bounds, true AS compresses
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------- exact-substring removal + reassembly (q90)
  /** [[Dedup.chunkDedupRemove]] over the corpus: 20-token chunks,
    * cross-document duplicates removed, text reassembled — the surgery
    * step on top of q72's diagnosis. Chunk content travels as md5-60
    * hashes (oracle-reproducible); the reassembled text is exported as
    * its md5 so the hash compare pins every surviving byte without
    * shipping full documents through the dump. */
  private def q90(s: SparkSession, d: String): DataFrame =
    Dedup.chunkDedupRemove(docs0(s, d), w = 20)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        md5(col("kept_text").cast("binary")).as("kept_md5"))
      .sortedOutWide("doc_id")

  private val q90Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |n AS (SELECT doc_id, tk, CAST(ceil(len(tk) / 20.0) AS BIGINT) AS nc FROM t WHERE len(tk) >= 1),
      |c AS (SELECT doc_id, tk, unnest(range(nc)) AS pos FROM n),
      |h AS (SELECT doc_id, pos,
      |        array_to_string(tk[pos*20+1 : pos*20+20], ' ') AS chunk,
      |        CAST(concat('0x', substr(md5(array_to_string(tk[pos*20+1 : pos*20+20], ' ')), 1, 15)) AS BIGINT) AS gh
      |      FROM c),
      |d AS (SELECT gh FROM h GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
      |stats AS (SELECT h.doc_id,
      |            count(*) AS n_chunks,
      |            count(d.gh) AS n_dup,
      |            coalesce(string_agg(CASE WHEN d.gh IS NULL THEN h.chunk END, ' ' ORDER BY h.pos), '') AS kept
      |          FROM h LEFT JOIN d ON h.gh = d.gh GROUP BY h.doc_id)
      |SELECT doc_id, CAST(n_chunks AS INTEGER) AS n_chunks,
      |       CAST(n_dup AS INTEGER) AS n_dup_chunks, md5(kept) AS kept_md5
      |FROM stats ORDER BY doc_id""".stripMargin

  // ------------------- per-language quantile quality gate (q93)
  /** Stratified quality filtering — "drop each language's bottom
    * quartile", the form quality gates actually take in corpus curation
    * (a single global threshold over-prunes low-resource languages).
    * Score = avg token length (q25's exact-division contract); the
    * per-language rank position decides survival, so the gate adapts
    * to each language's own score distribution.
    *
    * Determinism: percent_rank is (rank-1)/(N-1) on an ordering made
    * total by the doc_id tie-break — integer rank arithmetic, one IEEE
    * division. Note the floor row of every language has pr = 0 and is
    * always dropped (as is a single-doc language): the gate is strict
    * "survive the bottom quartile", documented rather than patched.
    *
    * Scale shape: one window sort per language partition (the narrow
    * score projection shuffles once on lang; skewed languages ride
    * AQE). At 100 TB the same contract runs as a two-pass
    * approx_percentile(score, 0.25) per lang + broadcast threshold
    * join — the window form is the exact oracled twin. */
  private def q93(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val scored = docs0(s, d).select(col("doc_id"), col("lang"),
      (TextFunctions.nonSpaceChars(col("text")) / size(toks)).as("score"))
    val w = Window.partitionBy(col("lang")).orderBy(col("score"), col("doc_id"))
    scored.withColumn("pr", percent_rank().over(w))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("pr") >= 0.25, 1)).as("n_kept"),
        min(when(col("pr") >= 0.25, col("score"))).as("threshold_score"))
      .sortedOut("lang")
  }

  private val q93Sql =
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    length(regexp_replace(text, '\s', '', 'g'))
      |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS score
      |  FROM documents),
      |pr AS (
      |  SELECT lang, score,
      |         percent_rank() OVER (PARTITION BY lang ORDER BY score, doc_id) AS pr
      |  FROM scored)
      |SELECT lang, count(*) AS n_total,
      |       count(CASE WHEN pr >= 0.25 THEN 1 END) AS n_kept,
      |       min(CASE WHEN pr >= 0.25 THEN score END) AS threshold_score
      |FROM pr GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------- near-dup graph degree histogram (q95)
  /** Degree distribution of the near-dup candidate graph — the
    * diagnostic run BEFORE cluster resolution: a heavy right tail
    * means hot buckets / boilerplate super-nodes that will over-merge
    * into giant clusters (and blow up pair counts quadratically), so
    * production pipelines gate cluster resolution on this histogram.
    * Degree 0 (docs untouched by any candidate pair) is reported
    * explicitly — "how much of the corpus is even in play" is the
    * first number a curation run reads.
    *
    * Scale shape: pairs carry ids only; two map-side-combined integer
    * aggregations (per-doc degree, then per-degree count); the
    * degree-0 row is a two-scalar broadcast subtraction. */
  private def q95(s: SparkSession, d: String): DataFrame = {
    // both branch points fan out (pairs → two union arms; deg → the
    // histogram AND the node count), so without persists the whole
    // LSH pipeline executes up to 4x (measured 5.8 s vs 2.6 s at
    // sf0.1). Unpersist falls to the ContextCleaner; the frames are
    // (id, id) and (id, int) respectively.
    val pairs = Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs0(s, d), k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7)
      .select(col("doc_a"), col("doc_b"))
      .persistT
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      .persistT
    val histo = deg.groupBy("degree").agg(count(lit(1)).as("n_docs"))
    val zeroRow = docs0(s, d).agg(count(lit(1)).as("n_total"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .select(lit(0L).as("degree"), (col("n_total") - col("n_nodes")).as("n_docs"))
    histo.unionAll(zeroRow).sortedOut("degree")
  }

  private val q95Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |p AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.7),
       |deg AS (
       |  SELECT doc_id, count(*) AS degree
       |  FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u
       |  GROUP BY doc_id),
       |h AS (
       |  SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree
       |  UNION ALL
       |  SELECT 0 AS degree,
       |         (SELECT count(*) FROM documents) - (SELECT count(*) FROM deg) AS n_docs)
       |SELECT CAST(degree AS BIGINT) AS degree, CAST(n_docs AS BIGINT) AS n_docs
       |FROM h ORDER BY degree""".stripMargin

  // ------------------------- deterministic epoch shuffle (q97)
  /** [[graft.ops.Sampling.epochShuffle]] under the oracle gate: the
    * training-run corpus reorder — seeded hash → shard split → within-
    * shard shuffled order. The oracle pins the EXACT order, not just
    * membership: per shard, md5 of the comma-joined doc_id sequence
    * sorted by (hv, doc_id) must match DuckDB's string_agg replay.
    *
    * The per-shard collect_list here is the VERIFICATION twin only —
    * it buffers a whole shard in one aggregation buffer to pin the
    * order hash. The production path never collects: it is
    * `writeCorpus(..., partitionCols = Seq("shard"), sortCols =
    * Seq("__shuffle_hv"))` — a narrow projection + partitioned sorted
    * write at any scale (same caveat pattern as the exact-percentile
    * twins). */
  private def q97(s: SparkSession, d: String): DataFrame = {
    val sharded = graft.ops.Sampling.epochShuffle(
      docs0(s, d), col("doc_id"), seed = 977, nShards = 8)
    sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           md5(concat_ws(",",
             transform(
               array_sort(collect_list(struct(col("__shuffle_hv"), col("doc_id")))),
               x => x.getField("doc_id").cast("string"))).cast("binary")).as("order_md5"))
      .sortedOut("shard")
  }

  private val q97Sql = {
    val hv = graft.text.Hashing.duckH60("concat('977:', CAST(doc_id AS VARCHAR))")
    s"""WITH h AS (
       |  SELECT doc_id, n_chars, $hv AS hv FROM documents)
       |SELECT hv % 8 AS shard, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY hv, doc_id)) AS order_md5
       |FROM h GROUP BY shard ORDER BY shard""".stripMargin
  }

  // ----------------------- weighted deterministic sampling (q99)
  /** [[graft.ops.Sampling.weightedSample]] under the oracle gate:
    * keep probability ∝ n_chars (unit weight 1000 chars — docs above
    * 1000 chars are certain keeps), counted per language. The kept
    * set is a pure integer-compare function of (doc_id, n_chars), so
    * DuckDB replays membership exactly. Narrow filter + one
    * aggregation; nothing shuffles but the group-by. */
  private def q99(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.weightedSample(
        docs0(s, d), col("doc_id"), col("n_chars"), unitWeight = 1000L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
           sum(col("n_chars")).as("sum_chars_kept"),
           min(col("doc_id")).as("min_kept_doc"))
      .sortedOut("lang")

  private val q99Sql = {
    val hv = graft.text.Hashing.duckH60("CAST(doc_id AS VARCHAR)")
    val scale = (1L << 60) / 1000L
    s"""SELECT lang, count(*) AS n_kept,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars_kept,
       |       min(doc_id) AS min_kept_doc
       |FROM documents
       |WHERE $hv < least(n_chars, 1000) * $scale
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // -------------------- RAG chunking: sliding windows (q100)
  /** Overlapping sliding-window chunking — the retrieval-embedding
    * prep step (q90's chunks are DISJOINT dedup units; RAG chunks
    * OVERLAP so no answer span is split across chunk boundaries):
    * window 20 tokens, stride 10, chunk count = ceil(nTok/stride),
    * tail chunks run short. One narrow generate per doc — the token
    * array never crosses a shuffle; every chunk's content is pinned
    * by md5 so the oracle verifies byte-exact chunking, not counts.
    * At scale the chunk table is the input to the embedding batch job
    * (mapInPandas) and lands via writeCorpus. */
  private def q100(s: SparkSession, d: String): DataFrame = {
    val w = 20
    val stride = 10
    val tk = TextFunctions.tokens(col("text"))
    val nChunks = floor((size(tk) + lit(stride - 1)).cast(DoubleType) / lit(stride)).cast(LongType)
    docs0(s, d)
      .select(col("doc_id"), tk.as("tk"), nChunks.as("nc"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0L), (col("nc") - 1) * stride, lit(stride.toLong))))
      .select(col("doc_id"), col("pos").cast(IntegerType).as("chunk_idx"),
        size(slice(col("tk"), col("col") + 1, lit(w))).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("tk"), col("col") + 1, lit(w))).cast("binary")).as("chunk_md5"))
      .sortedOutWide("doc_id", "chunk_idx")
  }

  private val q100Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |n AS (SELECT doc_id, tk, CAST(ceil(len(tk) / 10.0) AS BIGINT) AS nc FROM t),
      |c AS (SELECT doc_id, tk, CAST(unnest(range(nc)) AS BIGINT) AS idx FROM n)
      |SELECT doc_id, CAST(idx AS INTEGER) AS chunk_idx,
      |       CAST(len(tk[idx*10+1 : idx*10+20]) AS INTEGER) AS n_chunk_tokens,
      |       md5(array_to_string(tk[idx*10+1 : idx*10+20], ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------- bloom-prefiltered decontamination (q102)
  /** q74's decontamination in the big-benchmark regime
    * ([[Dedup.contaminationStatsBloom]]): a bloom filter over the
    * benchmark grams pre-filters the corpus gram explosion inside
    * codegen before the exact (now shuffle) semi-join verify. Output
    * is identical to q74 by construction — the oracle IS q74's SQL —
    * so the driver compare doubles as the proof that the bloom arm is
    * semantics-free. */
  private def q102(s: SparkSession, d: String): DataFrame = {
    val all = docs0(s, d)
    Dedup.contaminationStatsBloom(
        all.where(col("doc_id") % 10 =!= 0),
        all.where(col("doc_id") % 10 === 0), n = 13)
      .sortedOutWide("doc_id")
  }

  // --------------------- BPE tokenizer: fit + encode (q104)
  /** Real byte-pair-encoding ([[graft.text.Bpe]]): merge table fitted
    * on the corpus itself (distributed type counts, driver-side merge
    * loop), then every document encoded by the native expression. The
    * merge table is engine-side fitted data the oracle can't re-derive,
    * so the contract columns are what BPE guarantees REGARDLESS of the
    * learned merges (q89 discipline): per-pretoken concatenation is
    * lossless, and the token count sits in [n_pretokens, n_chars].
    * n_pretokens itself is exact cross-engine (q66's regex). */
  private def q104(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val merges = graft.text.Bpe.fit(docs, numMerges = 200)
    val pre = TextFunctions.bpeTokens(col("text"))
    val toks = graft.text.Bpe.encode(col("text"), merges)
    docs.select(col("doc_id"), pre.as("__pre"), toks.as("__toks"))
      .select(col("doc_id"),
        size(col("__pre")).as("n_pretokens"),
        (array_join(col("__toks"), "") === array_join(col("__pre"), ""))
          .as("lossless"),
        size(col("__toks")).between(size(col("__pre")),
          length(array_join(col("__pre"), ""))).as("n_tokens_in_bounds"))
      .sortedOutWide("doc_id")
  }

  private val q104Sql =
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_pretokens,
      | true AS lossless, true AS n_tokens_in_bounds
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------- leakage-safe group-held-out split (q106)
  /** [[graft.ops.Sampling.groupSplit]]: train/val/test assigned by
    * hashing the GROUP (here a synthetic domain, doc_id mod 257) so
    * no group straddles the train/test boundary. Exact oracle — the
    * split is a pure md5-60 function of (seed, domain), and the SQL
    * inlines the SAME cumulative hash-space bounds the operator
    * computes (computed once here, shared by both sides, so double
    * rounding can't diverge). */
  private val q106Weights = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
  private val q106Seed = 11
  private def q106(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.groupSplit(
        docs0(s, d).withColumn("domain", col("doc_id") % 257),
        col("domain"), q106Weights, seed = q106Seed)
      .select(col("doc_id"), col("domain"), col("split"))
      .sortedOutWide("doc_id")

  private val q106Sql = {
    val hv = graft.text.Hashing.duckH60(
      s"concat('$q106Seed:', CAST(domain AS VARCHAR))")
    val bounds = q106Weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * (1L << 60).toDouble).toLong)
    s"""WITH d AS (SELECT doc_id, doc_id % 257 AS domain FROM documents),
       |h AS (SELECT doc_id, domain, $hv AS hv FROM d)
       |SELECT doc_id, domain,
       |  CASE WHEN hv < ${bounds(0)} THEN 'train'
       |       WHEN hv < ${bounds(1)} THEN 'val' ELSE 'test' END AS split
       |FROM h ORDER BY doc_id""".stripMargin
  }

  // ------------- linear quality-classifier gate (q112)
  /** Model-based quality filter — the fastText-style classifier gate
    * that follows the heuristic filters in a curation pipeline. Per-doc
    * linear margin over the q25 feature set with PINNED weights (an
    * output of [[graft.ops.LinearModel.fitLogistic]] on a labeled
    * sample — see LinearModelSpec — rounded to exact binary fractions
    * so both engines parse identical doubles); decision = margin > 0.
    * The margin is the LINEAR score, not the sigmoid: per-row IEEE
    * double arithmetic over an identical left-associated expression
    * tree is bit-reproducible cross-engine, while exp() is
    * libm-dependent — the sigmoid stays in the fit. Scale: a pure
    * narrow projection; the model rides the plan as literals. */
  private val q112W = Seq(-1.25, 2.0, 0.25, -3.5)
  private def q112(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    docs0(s, d).select(
        col("doc_id"),
        (nTok.cast(DoubleType) / lit(256.0)).as("x_tokens"),
        (TextFunctions.nonSpaceChars(col("text")) / nTok).as("x_avg_len"),
        (stopHits / nTok).as("x_stop"))
      .select(col("doc_id"),
        graft.ops.LinearModel.margin(q112W,
          Seq(col("x_tokens"), col("x_avg_len"), col("x_stop"))).as("score"))
      .select(col("doc_id"), col("score"), (col("score") > 0).as("keep"))
      .sortedOutWide("doc_id")
  }

  private val q112Sql =
    """SELECT doc_id, score, score > 0 AS keep FROM (
      |  SELECT doc_id,
      |    -1.25 + 2.0 * (CAST(len(toks) AS DOUBLE) / 256.0)
      |          + 0.25 * (length(regexp_replace(text, '\s', '', 'g')) / len(toks))
      |          + -3.5 * (len(list_filter(toks,
      |                      t -> t IN ('the','a','of','and','to','in','is'))) / len(toks))
      |      AS score
      |  FROM (SELECT *, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ------------- standing inverted-index BM25 probe (q113)
  /** q63's ranking served from the STANDING [[graft.text.TextIndex]]:
    * posting lists bucketed by term (probe = bucket-pruned scan of the
    * query's |terms| buckets, never the corpus), df/corpus stats as
    * merge-on-read partials. Same oracle SQL as q63 — the proof the
    * index is a serving-layout change, not a semantics change (the
    * probe reuses q63's exact score tree over identical column types).
    * Build-once-per-(session, sf), like q86: the serving contract is
    * "maintained once, probed per query", so the timed surface is the
    * probe. */
  private def q113(s: SparkSession, d: String): DataFrame = {
    val name = "q113_textidx_" + new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
    val spec = graft.text.TextIndex.Spec(buckets = 64)
    // all three tables must exist — a write that died mid-way must be
    // retried, not skipped forever (q86 discipline)
    if (!Seq("_postings", "_termstats", "_stats")
          .forall(sfx => s.catalog.tableExists(name + sfx)))
      graft.text.TextIndex.write(docs0(s, d), name, spec)
    graft.text.TextIndex.probe(s, name, Seq("join", "stream", "vector"), k = 20)
      .withColumnsRenamed(Map("tf0" -> "tf_join", "tf1" -> "tf_stream",
        "tf2" -> "tf_vector"))
  }

  // ------------------------------------ per-domain quota cap (q115)
  /** Crawl-curation domain cap: keep at most 10 docs per source, chosen
    * by md5-60 priority — [[graft.ops.Sampling.domainCap]] riding the
    * custom TopKPerKey operator. Same selection as a ranking window
    * (the oracle's formulation) but the shuffle carries ≤ cap rows per
    * (source, partition) instead of every row of every hot domain —
    * the difference between shuffling a bounded digest and shuffling
    * the crawl at 100 TB. */
  private def q115(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.domainCap(
        docs0(s, d).select(col("doc_id"), col("source")),
        domain = col("source"), key = col("doc_id"), cap = 10)
      .sortedOutWide("source", "pri")

  private val q115Sql = {
    val h = graft.text.Hashing.duckH60("CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source, pri FROM (
       |  SELECT doc_id, source, $h AS pri,
       |         row_number() OVER (PARTITION BY source ORDER BY $h, doc_id) AS rn
       |  FROM documents) WHERE rn <= 10
       |ORDER BY source, pri""".stripMargin
  }

  // ---------------------------- bigram-LM familiarity scoring (q116)
  /** Language-model-style quality scoring without floats: a bigram LM
    * is "trained" on the 90% split (doc_id % 10 <> 0 — the distinct
    * bigram vocabulary) and every held-out doc is scored by how many of
    * its bigrams the model has seen. n_known/n_bigrams is the familiar
    * integer-safe proxy for LM log-likelihood filtering (CCNet-style
    * perplexity gates): unseen-bigram mass IS the OOV penalty term, and
    * integers hash-match across engines where log-probs cannot.
    *
    * Scale shape: bigrams travel as md5-60 HASHES from the moment they
    * leave the per-row projection (text never crosses a shuffle — q74's
    * discipline); the train vocabulary is distinct-reduced map-side
    * before the one hash-partitioned equi-join; counts fold back
    * per-doc in a map-side-combinable aggregate. The train vocab is
    * O(distinct bigrams) — at corpus scale that is a table, not a
    * broadcast, which is exactly why this is a join and not an IN-list.
    */
  private def q116(s: SparkSession, d: String): DataFrame = {
    // tokens MUST be materialized as a column before bigrams(): inlining
    // the split into the transform lambda makes every element_at
    // re-split the whole text — O(tokens²) regex work per doc (measured
    // 18 s vs 1 s at sf0.1). Hash in the same projection (text never
    // leaves the row) and persist: three consumers below.
    val bg = docs0(s, d)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        transform(TextFunctions.bigrams(col("tk")), b => Hashing.h60(b)).as("bghs"))
      .persistT
    val trainVocab = bg.where(col("doc_id") % 10 =!= 0)
      .select(explode(col("bghs")).as("bh")).distinct()
      .withColumn("known", lit(1))
    val evalBg = bg.where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), explode(col("bghs")).as("bh"))
    val hits = evalBg.join(trainVocab, Seq("bh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), count(col("known")).as("n_known"),
        countDistinct(col("bh")).as("n_distinct"))
    // left join from the held-out doc list: a short doc with zero
    // bigrams must score (0, 0, 0), not vanish
    bg.where(col("doc_id") % 10 === 0).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
      .sortedOut("doc_id")
  }

  private val q116Sql =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, CASE WHEN len(tk) >= 2
       |           THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
       |           ELSE [] END AS bgs
       |  FROM d),
       |train AS (
       |  SELECT DISTINCT ${graft.text.Hashing.duckH60("b")} AS bh
       |  FROM (SELECT unnest(bgs) AS b FROM bg WHERE doc_id % 10 <> 0)),
       |ev AS (
       |  SELECT doc_id, ${graft.text.Hashing.duckH60("b")} AS bh
       |  FROM (SELECT doc_id, unnest(bgs) AS b FROM bg WHERE doc_id % 10 = 0)),
       |hits AS (
       |  SELECT ev.doc_id, count(*) AS n_bigrams,
       |         count(t.known) AS n_known, count(DISTINCT ev.bh) AS n_distinct
       |  FROM ev LEFT JOIN (SELECT bh, bh AS known FROM train) t USING (bh)
       |  GROUP BY ev.doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(h.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |       CAST(coalesce(h.n_known, 0) AS BIGINT) AS n_known,
       |       CAST(coalesce(h.n_distinct, 0) AS BIGINT) AS n_distinct
       |FROM d LEFT JOIN hits h USING (doc_id)
       |WHERE d.doc_id % 10 = 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------- asymmetric containment pairs (q119)
  /** Quote/wrapper detection: ordered near-dup pairs scored by
    * |grams(a) ∩ grams(b)| / |grams(a)| — the asymmetric relation
    * symmetric Jaccard (q56) misses when a fragment is embedded in a
    * much larger document. [[Dedup.containmentPairs]]: per-doc 5-gram
    * hash sets, df-capped inverted index (boilerplate grams generate
    * df² junk pairs and are dropped — bucketCap discipline), pair
    * counts map-side combined. */
  private def q119(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(docs0(s, d), n = 5, minContain = 0.8,
        minGrams = 10, dfCap = 1000)
      .sortedOutWide("doc_a", "doc_b")

  private val q119Sql = {
    val h = graft.text.Hashing.duckH60("array_to_string(tk[i:i+4], ' ')")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents),
       |g AS (SELECT DISTINCT doc_id,
       |        unnest(list_transform(range(1, len(tk) - 3), i -> $h)) AS gh
       |      FROM t WHERE len(tk) >= 5),
       |sizes AS (SELECT doc_id, count(*) AS n_a FROM g GROUP BY doc_id),
       |rare AS (SELECT gh FROM g GROUP BY gh HAVING count(*) <= 1000),
       |gi AS (SELECT g.* FROM g JOIN rare USING (gh)),
       |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |           FROM gi a JOIN gi b USING (gh) WHERE a.doc_id <> b.doc_id
       |           GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(n_a AS BIGINT) AS n_a,
       |       CAST(n_common AS BIGINT) AS n_common,
       |       CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
       |FROM common JOIN sizes ON sizes.doc_id = common.doc_a
       |WHERE n_a >= 10
       |  AND CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ------------------------- corpus snapshot diff (q121)
  /** Dataset-versioning diff ([[graft.ops.RelationalOps.snapshotDiff]]):
    * v2 is a deterministic re-crawl of the documents table — drops
    * doc_id%17==0, edits the text of doc_id%13==0 (among the kept),
    * discovers new docs (%19==0, shifted ids) — and the diff classifies
    * every id by comparing md5-60 content fingerprints under one full
    * outer join. Only (key, hash) frames move; the rollup is the
    * audit record a versioned corpus publishes per release. */
  private def q121(s: SparkSession, d: String): DataFrame = {
    val base = docs0(s, d)
    val v1 = base.select(col("doc_id"), Hashing.h60(col("text")).as("fp"))
    val kept = base.where(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2-edit")))
          .otherwise(col("text")).as("text"))
    val added = base.where(col("doc_id") % 19 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val v2 = kept.unionByName(added)
      .select(col("doc_id"), Hashing.h60(col("text")).as("fp"))
    graft.ops.RelationalOps.snapshotDiff(v1, v2, "doc_id", "fp")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .sortedOut("status")
  }

  private val q121Sql = {
    val h = graft.text.Hashing.duckH60("text")
    val h2 = graft.text.Hashing.duckH60("CASE WHEN doc_id % 13 = 0 THEN text || ' v2-edit' ELSE text END")
    s"""WITH v1 AS (SELECT doc_id, $h AS fp1 FROM documents),
       |v2 AS (
       |  SELECT doc_id, $h2 AS fp2
       |  FROM documents WHERE doc_id % 17 <> 0
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, $h AS fp2
       |  FROM documents WHERE doc_id % 19 = 0),
       |d AS (
       |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       |         CASE WHEN v1.doc_id IS NULL THEN 'added'
       |              WHEN v2.doc_id IS NULL THEN 'removed'
       |              WHEN fp1 = fp2 THEN 'unchanged'
       |              ELSE 'modified' END AS status
       |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
       |SELECT status, CAST(count(*) AS BIGINT) AS n,
       |       min(doc_id) AS min_id, max(doc_id) AS max_id
       |FROM d GROUP BY status ORDER BY status""".stripMargin
  }

  // ---------------- length-bucketed padded batching (q122)
  /** Padding-efficiency batching for training: docs are routed to a
    * power-of-two length bucket (16..512, oversize truncates to 512),
    * each bucket packs fixed-capacity 4096-token batches of
    * SAME-PADDED docs, and the manifest reports kept vs padded tokens
    * per (bucket, batch) — the waste a loader pays for padding.
    * Complements q70 (exact token-budget shards, no padding model).
    *
    * Shape note: batch assignment is a per-bucket rank window —
    * acceptable because buckets are FEW and the window carries two
    * longs per doc; for extreme single-bucket corpora reuse
    * [[graft.text.Packing.tokenShards]]' distributed prefix sum per
    * bucket instead. Integer div keeps batch ids exact cross-engine. */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val t = docs0(s, d).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    val lb = when(col("n_tok") <= 16, 16L).when(col("n_tok") <= 32, 32L)
      .when(col("n_tok") <= 64, 64L).when(col("n_tok") <= 128, 128L)
      .when(col("n_tok") <= 256, 256L).otherwise(512L)
    val w = Window.partitionBy("len_bucket").orderBy("doc_id")
    t.withColumn("len_bucket", lb)
      .withColumn("rn", row_number().over(w))
      .withColumn("batch", expr("(CAST(rn AS BIGINT) - 1) * len_bucket div 4096"))
      .groupBy("len_bucket", "batch")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("n_tok"), col("len_bucket"))).as("kept_tokens"))
      .select(col("len_bucket"), col("batch"), col("n_docs"), col("kept_tokens"),
        (col("n_docs") * col("len_bucket")).as("padded_tokens"),
        (col("n_docs") * col("len_bucket") - col("kept_tokens")).as("waste_tokens"))
      .sortedOut("len_bucket", "batch")
  }

  private val q122Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, n_tok,
      |         CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
      |              WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
      |              WHEN n_tok <= 256 THEN 256 ELSE 512 END AS len_bucket
      |  FROM t),
      |r AS (SELECT *, row_number() OVER (PARTITION BY len_bucket ORDER BY doc_id) AS rn FROM b),
      |x AS (SELECT *, (CAST(rn AS BIGINT) - 1) * len_bucket // 4096 AS batch FROM r)
      |SELECT CAST(len_bucket AS BIGINT) AS len_bucket, CAST(batch AS BIGINT) AS batch,
      |       count(*) AS n_docs,
      |       CAST(sum(least(n_tok, len_bucket)) AS BIGINT) AS kept_tokens,
      |       CAST(count(*) * len_bucket AS BIGINT) AS padded_tokens,
      |       CAST(count(*) * len_bucket - sum(least(n_tok, len_bucket)) AS BIGINT) AS waste_tokens
      |FROM x GROUP BY x.len_bucket, x.batch ORDER BY len_bucket, batch""".stripMargin

  // --------------------- collocation / phrase mining (q123)
  /** PMI-style collocation extraction — the phrase-mining pass a
    * tokenizer-vocabulary or stopword pipeline runs corpus-wide: which
    * adjacent token pairs co-occur far beyond chance. Association
    * score = (n_ab·N·N) / (B·n_a·n_b) (the exp of PMI with unigram
    * probabilities over N tokens and bigram probability over B
    * positions), minimum support 5, top-20.
    *
    * Scale shape: unigram and bigram counts are map-side-combinable
    * aggregates over exploded tokens (q45's precedent — the shuffled
    * unit is a short token, and the count table is vocabulary-sized,
    * orders of magnitude below the corpus); corpus totals ride a 1-row
    * broadcast (BM25 stats pattern); top-20 plans as
    * TakeOrderedAndProject. The score is products/quotients of exact
    * integer counts in one pinned expression — both engines produce
    * identical doubles, so the RANKING and the values hash-match. */
  private def q123(s: SparkSession, d: String): DataFrame = {
    val toks = docs0(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
    val uni = toks.groupBy("t").agg(count(lit(1)).as("n")).persistT
    val bg = docs0(s, d)
      .select(TextFunctions.tokens(col("text")).as("tk"))
      .select(explode(TextFunctions.bigrams(col("tk"))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n_ab"))
      .persistT // feeds the B total AND the support-filtered join
    val totals = uni.agg(sum(col("n")).as("n_tokens"))
      .crossJoin(bg.agg(sum(col("n_ab")).as("n_bigrams")))
    val dbl = (c: Column) => c.cast(DoubleType)
    bg.where(col("n_ab") >= 5)
      .withColumn("term_a", split(col("b"), " ").getItem(0))
      .withColumn("term_b", split(col("b"), " ").getItem(1))
      .join(uni.select(col("t").as("term_a"), col("n").as("n_a")), Seq("term_a"))
      .join(uni.select(col("t").as("term_b"), col("n").as("n_b")), Seq("term_b"))
      .crossJoin(broadcast(totals))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("n_a"), col("n_b"),
        ((dbl(col("n_ab")) * dbl(col("n_tokens")) * dbl(col("n_tokens"))) /
          (dbl(col("n_bigrams")) * dbl(col("n_a")) * dbl(col("n_b")))).as("score"))
      .orderBy(col("score").desc, col("term_a"), col("term_b"))
      .limit(20)
  }

  private val q123Sql =
    """WITH tk AS (
      |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |uni AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(tk) AS t FROM tk) GROUP BY t),
      |bg AS (
      |  SELECT b, CAST(count(*) AS BIGINT) AS n_ab
      |  FROM (SELECT unnest(CASE WHEN len(tk) >= 2
      |          THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
      |          ELSE [] END) AS b FROM tk)
      |  GROUP BY b),
      |tot AS (
      |  SELECT (SELECT CAST(sum(n) AS BIGINT) FROM uni) AS n_tokens,
      |         (SELECT CAST(sum(n_ab) AS BIGINT) FROM bg) AS n_bigrams)
      |SELECT term_a, term_b, n_ab, n_a, n_b, score FROM (
      |  SELECT split_part(b, ' ', 1) AS term_a, split_part(b, ' ', 2) AS term_b,
      |         n_ab, ua.n AS n_a, ub.n AS n_b,
      |         (CAST(n_ab AS DOUBLE) * CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) /
      |           (CAST(n_bigrams AS DOUBLE) * CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)) AS score
      |  FROM bg CROSS JOIN tot
      |  JOIN uni ua ON ua.t = split_part(b, ' ', 1)
      |  JOIN uni ub ON ub.t = split_part(b, ' ', 2)
      |  WHERE n_ab >= 5)
      |ORDER BY score DESC, term_a, term_b LIMIT 20""".stripMargin

  // ------------------ content-defined chunk dedup stats (q124)
  /** [[Dedup.cdcChunks]] corpus diagnosis: per doc, how many of its
    * content-defined chunks also occur in another document. The CDC
    * twin of q72/q90's fixed-grid stats — edit-resilient boundaries
    * mean a near-dup family shares most chunks even when edits shift
    * token positions. Chunk hashes travel (8 bytes), text never
    * crosses a shuffle; the dup-chunk aggregate combines map-side. */
  private def q124(s: SparkSession, d: String): DataFrame = {
    val chunked = Dedup.cdcChunks(docs0(s, d), modulus = 16).persistT
    val g = chunked.select(col("doc_id"), explode(col("chs")).as("ch"))
    val dup = g.groupBy("ch")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select("ch")
    val perDoc = g.join(dup, Seq("ch"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_chunks"))
    chunked.select(col("doc_id"), size(col("chs")).cast("long").as("n_chunks"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"))
      .sortedOut("doc_id")
  }

  /** Oracle uses the window formulation of the same chunking (chunk
    * index = running count of boundaries strictly before the position,
    * chunk content = position-ordered string_agg) — different shape,
    * identical chunks. */
  private val q124Sql = {
    val h = (e: String) => graft.text.Hashing.duckH60(e)
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
       |  FROM documents WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 1),
       |p0 AS (SELECT doc_id, tk, unnest(range(1, len(tk)+1)) AS i FROM t),
       |p AS (SELECT doc_id, i, tk[i] AS tok,
       |             CASE WHEN ${h("tk[i]")} % 16 = 0 THEN 1 ELSE 0 END AS flag
       |      FROM p0),
       |cx AS (SELECT doc_id, i, tok,
       |         coalesce(sum(flag) OVER (PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cidx
       |       FROM p),
       |ch AS (SELECT doc_id, cidx, ${h("string_agg(tok, ' ' ORDER BY i)")} AS ch
       |       FROM cx GROUP BY doc_id, cidx),
       |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM ch GROUP BY doc_id),
       |dup AS (SELECT ch FROM ch GROUP BY ch HAVING count(DISTINCT doc_id) >= 2),
       |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_chunks
       |            FROM ch JOIN dup USING (ch) GROUP BY doc_id)
       |SELECT c.doc_id, n_chunks,
       |       CAST(coalesce(n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks
       |FROM c LEFT JOIN per_doc ON per_doc.doc_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin
  }

  // ---------------- tokenizer fertility diagnostics (q125)
  /** Tokenizer-selection diagnostics per language: how many BPE-style
    * subword units each whitespace word fragments into (fertility) and
    * how many characters each unit carries — the numbers that decide
    * which tokenizer a corpus should train/serve with, reported from
    * ONE map-side-combinable aggregate pass. Ratios are single
    * divisions of exact integer sums, so the doubles hash-match. */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    docs0(s, d)
      .select(col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_words"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_units"),
        TextFunctions.nonSpaceChars(col("text")).cast("long").as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("n_units")).as("units"),
        sum(col("n_chars")).as("chars"))
      .select(col("lang"), col("n_docs"), col("words"), col("units"), col("chars"),
        (dbl(col("units")) / dbl(col("words"))).as("fertility"),
        (dbl(col("chars")) / dbl(col("units"))).as("chars_per_unit"))
      .sortedOut("lang")
  }

  private val q125Sql =
    s"""WITH t AS (
       |  SELECT lang,
       |    CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_words,
       |    CAST(len(regexp_extract_all(lower(text), '${TextFunctions.BpePattern}')) AS BIGINT) AS n_units,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_chars
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS words,
       |  CAST(sum(n_units) AS BIGINT) AS units,
       |  CAST(sum(n_chars) AS BIGINT) AS chars,
       |  CAST(sum(n_units) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS fertility,
       |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_units) AS DOUBLE) AS chars_per_unit
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ------------- intra-document repetition removal (q134)
  /** Self-repetition trim — the within-document twin of corpus dedup:
    * crawled pages repeat their own boilerplate (nav bars, footers,
    * generation loops), and the standard curation fix is to drop
    * repeated fixed-size token blocks WITHIN each document before any
    * cross-document pass sees it. Per doc: segment into 8-token
    * blocks, keep each block's first occurrence, report the token
    * budget recovered.
    *
    * Scale shape: the entire operator is one narrow projection — block
    * segmentation, first-occurrence filtering (`exists` over the
    * earlier-blocks slice) and token accounting all happen in-row
    * inside whole-stage codegen. ZERO exchanges: at 100 TB this runs
    * at scan speed and composes with any downstream shuffle for free.
    * The O(blocks²) in-row scan is bounded by (doc_len/8)² — for the
    * ≥1 GB pathological page a chunked `cdcChunks`-style hash map
    * would win, but at that length the doc is already past every
    * length gate in the pipeline. */
  private def q134(s: SparkSession, d: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    val withBlocks = docs0(s, d)
      .where(size(tk) >= 1)
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        TextFunctions.tokenBlocks(col("tk"), blockLen = 8).as("blocks"))
      .select(col("doc_id"), col("n_tokens"), col("blocks"),
        TextFunctions.firstOccurrences(col("blocks")).as("kept"))
    withBlocks.select(col("doc_id"), col("n_tokens"),
        size(col("blocks")).cast("long").as("n_blocks"),
        size(col("kept")).cast("long").as("n_kept_blocks"),
        aggregate(transform(col("kept"), b => size(split(b, " "))),
          lit(0), (a, x) => a + x).cast("long").as("n_tokens_kept"))
      .sortedOutWide("doc_id")
  }

  private val q134Sql =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
      |  FROM documents
      |  WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 1),
      |b AS (
      |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
      |         list_transform(range(0, (len(tk) - 1) // 8 + 1),
      |           i -> array_to_string(list_slice(tk, i*8 + 1, i*8 + 8), ' ')) AS blocks
      |  FROM t),
      |k AS (
      |  SELECT doc_id, n_tokens, blocks,
      |         list_filter(blocks, (bl, i) ->
      |           len(list_filter(list_slice(blocks, 1, i - 1), x -> x = bl)) = 0) AS kept
      |  FROM b)
      |SELECT doc_id, n_tokens,
      |       CAST(len(blocks) AS BIGINT) AS n_blocks,
      |       CAST(len(kept) AS BIGINT) AS n_kept_blocks,
      |       CAST(list_sum(list_transform(kept, bl -> len(string_split(bl, ' ')))) AS BIGINT)
      |         AS n_tokens_kept
      |FROM k ORDER BY doc_id""".stripMargin

  // ------------- n-gram novelty vs the standing corpus (q135)
  /** Incremental-curation novelty gate: for each document of an
    * incoming batch, what fraction of its distinct 5-gram shingles the
    * standing corpus has never seen. Low-novelty batches are re-crawls
    * or syndication and get down-weighted before training; the same
    * statistic drives crawl-frontier scheduling. The inverse of
    * decontamination (q74 asks "seen in the BENCHMARK", this asks
    * "UNSEEN in the corpus").
    *
    * Scale shape: grams travel as md5-60 hashes (8 bytes, text never
    * crosses a shuffle); the anti-join is hash-partitioned on `gh`, so
    * cost is (batch gram set + corpus gram set) through one exchange —
    * the corpus side would be a standing bucketed gram table in
    * production (built once per ingest, not per probe; the
    * SignatureIndex lifecycle). For corpora whose gram set dwarfs the
    * batch, a bloom of corpus grams (q102's tiered pattern, the
    * dedup-append sink's exact shape) resolves "definitely novel"
    * map-side and sends only the ~fpp sliver to the exact anti-join. */
  private def q135(s: SparkSession, d: String): DataFrame = {
    val all = docs0(s, d)
    val corpGrams = Dedup.ngramHashes(all.where(col("doc_id") % 10 =!= 0), n = 5)
      .select("gh").distinct()
    val incGrams = Dedup.ngramHashes(all.where(col("doc_id") % 10 === 0), n = 5)
      .distinct().persistT // feeds both the total and the anti-join
    val novel = incGrams.join(corpGrams, Seq("gh"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    incGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (coalesce(col("n_novel"), lit(0L)).cast(DoubleType) /
          col("n_grams").cast(DoubleType)).as("novelty"))
      .sortedOutWide("doc_id")
  }

  private val q135Sql = {
    val h = Hashing.duckH60("array_to_string(tk[i:i+4], ' ')")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents),
       |g0 AS (SELECT doc_id,
       |         unnest(list_transform(range(1, len(tk) - 3), i -> $h)) AS gh
       |       FROM t WHERE len(tk) >= 5),
       |g AS (SELECT DISTINCT doc_id, gh FROM g0),
       |corp AS (SELECT DISTINCT gh FROM g WHERE doc_id % 10 != 0),
       |inc AS (SELECT doc_id, gh FROM g WHERE doc_id % 10 = 0),
       |nov AS (SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_novel
       |        FROM inc i LEFT JOIN corp c USING (gh)
       |        WHERE c.gh IS NULL GROUP BY i.doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM inc GROUP BY doc_id)
       |SELECT tot.doc_id, n_grams,
       |       CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
       |       CAST(coalesce(n_novel, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE) AS novelty
       |FROM tot LEFT JOIN nov ON nov.doc_id = tot.doc_id
       |ORDER BY tot.doc_id""".stripMargin
  }

  // ------------- classifier calibration / reliability bins (q139)
  /** Reliability diagram for q112's quality classifier: bucket the
    * corpus by margin half-point bins and report, per bin, how often
    * the q25 quality criterion actually holds — the curve that decides
    * whether a score threshold transfers across sources and where to
    * place the keep/drop cut. One map-side-combinable aggregate pass;
    * counts and rates are exact integers/divisions, the per-bin mean
    * margin is a doc_id-ordered fold, so all doubles hash-match. */
  private def q139(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    val scored = docs0(s, d).select(
      col("doc_id"),
      graft.ops.LinearModel.margin(q112W, Seq(
        nTok.cast(DoubleType) / lit(256.0),
        TextFunctions.nonSpaceChars(col("text")) / nTok,
        stopHits / nTok)).as("score"),
      (nTok >= 5 && (stopHits / nTok) <= lit(0.5)).as("label"))
    scored.withColumn("bin", floor(col("score") * lit(2.0)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        (aggregate(array_sort(collect_list(struct(col("doc_id"), col("score").as("v")))),
          lit(0.0), (a, x) => a + x.getField("v")) /
          count(lit(1)).cast("double")).as("mean_score"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType)).as("pos_rate"),
        col("mean_score"))
      .sortedOut("bin")
  }

  private val q139Sql =
    """WITH s AS (
      |  SELECT doc_id,
      |    -1.25 + 2.0 * (CAST(len(toks) AS DOUBLE) / 256.0)
      |          + 0.25 * (length(regexp_replace(text, '\s', '', 'g')) / len(toks))
      |          + -3.5 * (len(list_filter(toks,
      |                      t -> t IN ('the','a','of','and','to','in','is'))) / len(toks))
      |      AS score,
      |    (len(toks) >= 5 AND len(list_filter(toks,
      |       t -> t IN ('the','a','of','and','to','in','is'))) / len(toks) <= 0.5) AS label
      |  FROM (SELECT *, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents)),
      |b AS (SELECT *, CAST(floor(score * 2.0) AS BIGINT) AS bin FROM s)
      |SELECT bin, count(*) AS n,
      |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate,
      |  list_sum(list(score ORDER BY doc_id)) / CAST(count(*) AS DOUBLE) AS mean_score
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  // ------------- sequence-length coverage curve (q140)
  /** The max_seq_len decision table: for each candidate context length,
    * what fraction of documents fit untruncated and what fraction of
    * corpus TOKENS survive truncation. This is the one-pass statistic
    * that sizes packing (q128), bucketing (q122) and the training
    * context window. Shape: a 6-way literal-array explode over the
    * per-doc token count (map-side combine to 6 groups), corpus totals
    * ride a 1-row broadcast. */
  private def q140(s: SparkSession, d: String): DataFrame = {
    val lens = Seq(16L, 32L, 64L, 128L, 256L, 512L)
    val t = docs0(s, d)
      .select(TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    val tot = t.agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("nt"))
    t.select(col("n_tok"), explode(array(lens.map(lit): _*)).as("max_len"))
      .groupBy("max_len")
      .agg(sum(when(col("n_tok") <= col("max_len"), 1L).otherwise(0L)).as("docs_fit"),
        sum(least(col("n_tok"), col("max_len"))).as("tokens_kept"))
      .crossJoin(broadcast(tot))
      .select(col("max_len"), col("docs_fit"), col("tokens_kept"),
        (col("docs_fit").cast(DoubleType) / col("nd").cast(DoubleType)).as("doc_coverage"),
        (col("tokens_kept").cast(DoubleType) / col("nt").cast(DoubleType)).as("token_coverage"))
      .sortedOut("max_len")
  }

  private val q140Sql =
    """WITH t AS (
      |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n_tok) AS BIGINT) AS nt FROM t),
      |x AS (SELECT n_tok, unnest([16, 32, 64, 128, 256, 512]) AS max_len FROM t)
      |SELECT CAST(max_len AS BIGINT) AS max_len,
      |  CAST(sum(CASE WHEN n_tok <= max_len THEN 1 ELSE 0 END) AS BIGINT) AS docs_fit,
      |  CAST(sum(least(n_tok, max_len)) AS BIGINT) AS tokens_kept,
      |  CAST(sum(CASE WHEN n_tok <= max_len THEN 1 ELSE 0 END) AS DOUBLE) / CAST(nd AS DOUBLE) AS doc_coverage,
      |  CAST(sum(least(n_tok, max_len)) AS DOUBLE) / CAST(nt AS DOUBLE) AS token_coverage
      |FROM x CROSS JOIN tot GROUP BY max_len, nd, nt ORDER BY max_len""".stripMargin

  // ------------- cross-source content overlap matrix (q142)
  /** Which ingest sources are re-serving each other's content: for
    * every source pair, the number of distinct 5-gram shingles both
    * contain and the gram-set Jaccard. Syndication networks, mirror
    * hosts and re-crawled snapshots show up as high-overlap pairs —
    * the signal that drives source-level (not doc-level) dedup
    * decisions and crawl-budget allocation.
    *
    * Scale shape: grams travel as md5-60 hashes; (source, gram)
    * distinct is one exchange; the per-gram DISTINCT source set is
    * bounded by |sources| (collect_set after the distinct — never
    * row-multiplied), and the i<j pair expansion happens in-row, so
    * the pair frame is ≤ C(|S|,2) rows per gram BEFORE its groupBy.
    * The per-source size table is |S| rows, broadcast onto the pair
    * aggregate. At 100 TB the only O(corpus) stages are the two
    * hash-partitioned exchanges on `gh`.
    *
    * Source-cardinality bound (AdvSweep `source_overlap_1000*`): the
    * in-row expansion builds ONE C(|srcs|,2)-struct array per gram
    * row — quadratic PER ROW. Measured at |S|=1000 with 50 universal
    * grams: 50.2 s in-row vs 9.0 s for the equivalent self-join on
    * `gh` (which distributes the same 25M pair rows across the
    * shuffle). Beyond ~10³ sources, switch to the join expansion and
    * df-cap the gram set (a gram every source carries identifies
    * nobody — containmentPairs' discipline). At this fixture's
    * |S|=20 the in-row form is the cheaper one (≤190 structs/row,
    * no second shuffle). */
  private def q142(s: SparkSession, d: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    val gramArr = transform(sequence(lit(1), size(col("tk")) - lit(4)),
      i => Hashing.h60(array_join(slice(col("tk"), i, lit(5)), " ")))
    val sg = docs0(s, d).where(size(tk) >= 5)
      .select(col("source"), tk.as("tk"))
      .select(col("source"), explode(gramArr).as("gh"))
      .distinct()
      .persistT // feeds the per-source sizes AND the per-gram source sets
    val sizes = sg.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val pairs = sg.groupBy("gh")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .where(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(col("srcs"), (a, i) =>
        transform(slice(col("srcs"), i + lit(2), size(col("srcs")) - i - lit(1)),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n_grams").as("na"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n_grams").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("n_shared").cast(DoubleType) /
          (col("na") + col("nb") - col("n_shared")).cast(DoubleType)).as("jaccard"))
      .sortedOut("src_a", "src_b")
  }

  private val q142Sql = {
    val h = Hashing.duckH60("array_to_string(tk[i:i+4], ' ')")
    s"""WITH t AS (SELECT source, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents),
       |g AS (SELECT DISTINCT source,
       |         unnest(list_transform(range(1, len(tk) - 3), i -> $h)) AS gh
       |       FROM t WHERE len(tk) >= 5),
       |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source),
       |p AS (SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_shared
       |      FROM g a JOIN g b USING (gh) WHERE a.source < b.source
       |      GROUP BY 1, 2)
       |SELECT src_a, src_b, n_shared,
       |  CAST(n_shared AS DOUBLE) / CAST(sa.n + sb.n - n_shared AS DOUBLE) AS jaccard
       |FROM p
       |JOIN sizes sa ON sa.source = src_a
       |JOIN sizes sb ON sb.source = src_b
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ------------- Kneser-Ney count-of-counts (q143)
  /** The LM-training statistic behind CCNet-style quality filtering:
    * per language, the bigram count-of-counts n1..n4 (how many distinct
    * bigrams occur exactly once, twice, ...) and the modified
    * Kneser-Ney discounts D1/D2/D3+ they imply (Chen & Goodman 1999:
    * Y = n1/(n1+2·n2), D_k = k - (k+1)·Y·n_{k+1}/n_k). These five
    * numbers per language are what an n-gram LM fit actually needs
    * from a 100 TB corpus — the full count table never leaves the
    * cluster, only its histogram does.
    *
    * Scale shape: bigrams travel as md5-60 hashes (8 bytes); ONE
    * hash-partitioned exchange on (lang, bigram-hash) with map-side
    * combine, then the count table collapses to a |lang|-row histogram
    * in a second map-side-combinable pass. Discount arithmetic is a
    * fixed expression over exact integers (guarded to NULL where a
    * zero count makes D_k undefined), so the doubles hash-match. */
  private def q143(s: SparkSession, d: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    val bigrams = docs0(s, d).where(size(tk) >= 2)
      .select(col("lang"), tk.as("tk"))
      .select(col("lang"), explode(transform(sequence(lit(1), size(col("tk")) - 1),
        i => Hashing.h60(array_join(slice(col("tk"), i, lit(2)), " ")))).as("bh"))
    val hist = bigrams.groupBy("lang", "bh").agg(count(lit(1)).as("c"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("c") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("c") === 4, 1L).otherwise(0L)).as("n4"))
    val y = col("n1").cast(DoubleType) / (col("n1") + col("n2") * 2).cast(DoubleType)
    def disc(k: Int, nk: Column, nk1: Column): Column =
      when(nk > 0 && col("n1") + col("n2") * 2 > 0,
        lit(k.toDouble) - lit((k + 1).toDouble) * y *
          (nk1.cast(DoubleType) / nk.cast(DoubleType)))
    hist.select(col("lang"), col("n_types"), col("n_tokens"),
        col("n1"), col("n2"), col("n3"), col("n4"),
        disc(1, col("n1"), col("n2")).as("d1"),
        disc(2, col("n2"), col("n3")).as("d2"),
        disc(3, col("n3"), col("n4")).as("d3"))
      .sortedOut("lang")
  }

  private val q143Sql = {
    val h = Hashing.duckH60("array_to_string(tk[i:i+1], ' ')")
    def disc(k: Int, nk: String, nk1: String) =
      s"""CASE WHEN $nk > 0 AND n1 + n2 * 2 > 0
         |  THEN ${k}.0 - ${k + 1}.0 * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 * 2 AS DOUBLE))
         |       * (CAST($nk1 AS DOUBLE) / CAST($nk AS DOUBLE)) END""".stripMargin
    s"""WITH t AS (SELECT lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents),
       |b AS (SELECT lang, unnest(list_transform(range(1, len(tk)), i -> $h)) AS bh
       |      FROM t WHERE len(tk) >= 2),
       |c AS (SELECT lang, bh, count(*) AS c FROM b GROUP BY 1, 2),
       |h AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |  CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |  CAST(sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |  FROM c GROUP BY lang)
       |SELECT lang, n_types, n_tokens, n1, n2, n3, n4,
       |  ${disc(1, "n1", "n2")} AS d1,
       |  ${disc(2, "n2", "n3")} AS d2,
       |  ${disc(3, "n3", "n4")} AS d3
       |FROM h ORDER BY lang""".stripMargin
  }

  // ------------- contamination span localization (q145)
  /** WHERE the benchmark leak sits inside each contaminated document —
    * the surgical complement of q74's whole-doc verdict: per
    * contaminated doc, the first and last token positions covered by
    * a benchmark 13-gram, the hit count and the covered-span fraction.
    * With spans in hand the pipeline can excise the leaked passage
    * (q90's removal machinery) instead of dropping the whole document
    * — at 100 TB the difference between losing 0.01% and 3% of tokens
    * to decontamination.
    *
    * Scale shape: identical to q74 plus an 8-byte position riding next
    * to each gram hash — same single hash-partitioned join against the
    * benchmark gram set (broadcast or bloom-tiered per q102 when the
    * benchmark is large), then a per-doc min/max/count aggregate.
    * Text never crosses a shuffle. */
  private def q145(s: SparkSession, d: String): DataFrame = {
    val n = 13
    val tk = TextFunctions.tokens(col("text"))
    val t = docs0(s, d).where(size(tk) >= n)
      .select(col("doc_id"), tk.as("tk"))
    val gramArr = transform(sequence(lit(1), size(col("tk")) - lit(n - 1)),
      i => Hashing.h60(array_join(slice(col("tk"), i, lit(n)), " ")))
    val grams = t.select(col("doc_id"), size(col("tk")).cast(LongType).as("n_tok"),
      posexplode(gramArr).as(Seq("p0", "gh")))
    val bench = grams.where(col("doc_id") % 10 === 0).select("gh").distinct()
    grams.where(col("doc_id") % 10 =!= 0)
      .join(bench, "gh")
      .groupBy("doc_id")
      .agg(max(col("n_tok")).as("n_tokens"),
           count(lit(1)).as("n_hits"),
           (min(col("p0")) + 1).cast(LongType).as("first_tok"),
           (max(col("p0")) + lit(n)).cast(LongType).as("last_tok"))
      .select(col("doc_id"), col("n_tokens"), col("n_hits"), col("first_tok"), col("last_tok"),
        ((col("last_tok") - col("first_tok") + 1).cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("span_frac"))
      .sortedOutWide("doc_id")
  }

  private val q145Sql = {
    val h = Hashing.duckH60("array_to_string(tk[i:i+12], ' ')")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents),
       |g AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
       |        unnest(range(1, len(tk) - 11)) AS p,
       |        unnest(list_transform(range(1, len(tk) - 11), i -> $h)) AS gh
       |      FROM t WHERE len(tk) >= 13),
       |bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % 10 = 0)
       |SELECT doc_id, max(n_tok) AS n_tokens, CAST(count(*) AS BIGINT) AS n_hits,
       |  CAST(min(p) AS BIGINT) AS first_tok,
       |  CAST(max(p) + 12 AS BIGINT) AS last_tok,
       |  CAST(max(p) + 12 - min(p) + 1 AS DOUBLE) / CAST(max(n_tok) AS DOUBLE) AS span_frac
       |FROM g JOIN bench USING (gh)
       |WHERE doc_id % 10 != 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------- Poisson-bootstrap corpus-metric uncertainty (q146)
  /** Error bars for a corpus statistic without a second pass: the
    * Poisson bootstrap (the standard resampling scheme when n is too
    * large to multinomial-sample — each replica weights every doc
    * Poisson(1), here derived DETERMINISTICALLY from md5-60(doc:rep)
    * against precomputed CDF thresholds). 32 replica means of the
    * per-doc token count; the spread of `mean_tok` across replicas IS
    * the sampling distribution — its quantiles are the CI the
    * curation report quotes next to the point estimate.
    *
    * Scale shape: the 32× row expansion collapses map-side into 32
    * groups (sums of integers — no double folds anywhere until the
    * final per-replica division), so the whole operator is one scan
    * with a 32-row shuffle. Thresholds are exact integer literals
    * shared verbatim with the oracle. */
  private def q146(s: SparkSession, d: String): DataFrame = {
    val thr = PoissonThresholds
    val t = docs0(s, d).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"))
    val u = Hashing.h60(concat(col("doc_id").cast("string"), lit(":"), col("r").cast("string")))
    // built inside-out so the SMALLEST threshold is tested first,
    // mirroring the oracle's CASE arm order exactly
    val w = thr.zipWithIndex.reverse.foldLeft(lit(thr.length.toLong)) { case (acc, (tk, k)) =>
      when(col("u") < lit(tk), k.toLong).otherwise(acc)
    }
    t.select(col("doc_id"), col("n_tok"), explode(sequence(lit(0), lit(31))).as("r"))
      .select(col("r").cast(LongType).as("r"), col("n_tok"), u.as("u"))
      .select(col("r"), col("n_tok"), w.as("w"))
      .groupBy("r")
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("n_tok")).as("w_tok"))
      .select(col("r"), col("n_eff"), col("w_tok"),
        (col("w_tok").cast(DoubleType) / col("n_eff").cast(DoubleType)).as("mean_tok"))
      .sortedOut("r")
  }

  /** Poisson(1) CDF split points scaled to the md5-60 hash space:
    * thresholds(k) = floor(P(X<=k-1)·2^60); a hash below thresholds(k)
    * and at/above thresholds(k-1) means weight k-1, at/above the last
    * threshold means weight 5 (P beyond ~0.04%). Identical literals are
    * inlined into the DuckDB oracle, so the weights are bit-equal. */
  private val PoissonThresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val cdf = Seq(1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0).map(_ * e1) // P(<=0..4)
    cdf.map(p => (p * math.pow(2.0, 60)).toLong)
  }

  private val q146Sql = {
    val h = Hashing.duckH60("CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)")
    val caseW = PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoissonThresholds.length} END")
    s"""WITH t AS (SELECT doc_id,
       |             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
       |           FROM documents),
       |x AS (SELECT doc_id, n_tok, unnest(range(0, 32)) AS r FROM t),
       |wt AS (SELECT r, n_tok, $caseW AS w
       |       FROM (SELECT doc_id, n_tok, r, $h AS u FROM x))
       |SELECT CAST(r AS BIGINT) AS r, CAST(sum(w) AS BIGINT) AS n_eff,
       |  CAST(sum(w * n_tok) AS BIGINT) AS w_tok,
       |  CAST(sum(w * n_tok) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mean_tok
       |FROM wt GROUP BY r ORDER BY r""".stripMargin
  }

  // ------------- length-curriculum phase assignment (q147)
  /** Curriculum ordering — train on easy (short) documents first:
    * every doc gets its exact global rank under (n_tokens, doc_id) and
    * a tertile phase 0/1/2. The standard sequence-length curriculum
    * (and the template for any scored curriculum: swap n_tokens for a
    * quality margin).
    *
    * Scale shape: the global rank rides
    * [[graft.ops.RelationalOps.globalRowNumber]] — range partition +
    * local sort + a P-long count round — NOT a single-partition
    * `row_number` window (the canonical global-sort OOM cliff). The
    * tertile boundary arithmetic is a broadcast 1-row total; phase =
    * floor((rn-1)·3/N) is double-exact for any corpus below 10^15
    * docs (|p/N − m| ≥ 1/N ≫ half-ulp whenever p/N is not exactly m). */
  private def q147(s: SparkSession, d: String): DataFrame = {
    val t = docs0(s, d).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"))
    val ranked = graft.ops.RelationalOps.globalRowNumber(
      t, Seq(col("n_tok").asc, col("doc_id").asc), "rn")
    val tot = t.agg(count(lit(1)).as("nd"))
    ranked.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_tok"), col("rn"),
        floor((col("rn") - 1) * 3 / col("nd")).as("phase"))
      .sortedOutWide("doc_id")
  }

  private val q147Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |r AS (SELECT doc_id, n_tok,
      |        CAST(row_number() OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS rn
      |      FROM t),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM t)
      |SELECT doc_id, n_tok, rn,
      |  CAST(floor(CAST((rn - 1) * 3 AS DOUBLE) / CAST(nd AS DOUBLE)) AS BIGINT) AS phase
      |FROM r CROSS JOIN tot ORDER BY doc_id""".stripMargin

  // ------------- per-source length-distribution anomaly (q149)
  /** Which sources don't look like the corpus: a chi-square test of
    * each source's token-length histogram against the corpus-wide
    * distribution. A source whose length profile diverges (truncated
    * scrapes, pagination fragments, template spam) fails the test
    * long before eyeballing samples would catch it — the automated
    * "this feed changed shape" alarm next to the schema-drift and
    * embedding-drift (q144) monitors.
    *
    * Scale shape: ONE map-side-combinable pass bins the corpus into a
    * ≤|S|·|bins| count table; every rollup (per-source totals, per-bin
    * totals, grand total, the expected-count grid and the chi-square
    * fold) happens on that tiny frame. Zero-observed (source, bin)
    * cells are restored by the grid join — dropping them would bias
    * chi2 low exactly for the most anomalous sources. Terms fold in
    * bin order, so the doubles hash-match. */
  private def q149(s: SparkSession, d: String): DataFrame = {
    val nTok = TextFunctions.tokenCount(col("text"))
    val bin = when(nTok <= 24, 0).when(nTok <= 48, 1)
      .when(nTok <= 72, 2).when(nTok <= 96, 3).otherwise(4)
    val obs = docs0(s, d).select(col("source"), bin.as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("o"))
      .persistT // four rollups below read it
    val ns = obs.groupBy("source").agg(sum(col("o")).as("ns"))
    // limit(8) cannot truncate (the bin CASE has exactly 5 outcomes);
    // it makes the grid join's build side statically bounded
    val nb = obs.groupBy("bin").agg(sum(col("o")).as("nb")).limit(8)
    val ntot = obs.agg(sum(col("o")).as("n"))
    val e = (col("ns") * col("nb")).cast(DoubleType) / col("n").cast(DoubleType)
    val dev = col("o").cast(DoubleType) - e
    ns.crossJoin(nb)
      .join(obs, Seq("source", "bin"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(ntot))
      .select(col("source"), col("ns"), col("bin"), (dev * dev / e).as("term"))
      .groupBy("source")
      .agg(max(col("ns")).as("n_docs"),
           sort_array(collect_list(struct(col("bin"), col("term")))).as("ts"))
      .select(col("source"), col("n_docs"),
        aggregate(col("ts"), lit(0.0), (acc, v) => acc + v.getField("term")).as("chi2"))
      .withColumn("is_anomalous", col("chi2") > lit(9.488))
      .sortedOut("source")
  }

  private val q149Sql =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |t AS (SELECT source, CASE WHEN n_tok <= 24 THEN 0 WHEN n_tok <= 48 THEN 1
      |        WHEN n_tok <= 72 THEN 2 WHEN n_tok <= 96 THEN 3 ELSE 4 END AS bin FROM d),
      |obs AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS o FROM t GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(o) AS BIGINT) AS ns FROM obs GROUP BY 1),
      |nb AS (SELECT bin, CAST(sum(o) AS BIGINT) AS nb FROM obs GROUP BY 1),
      |ntot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
      |x AS (SELECT g.source, g.ns, g.bin,
      |        CAST(coalesce(o.o, 0) AS BIGINT) AS o, g.nb, n
      |      FROM (SELECT ns.source, ns.ns, nb.bin, nb.nb FROM ns CROSS JOIN nb) g
      |      LEFT JOIN obs o ON o.source = g.source AND o.bin = g.bin
      |      CROSS JOIN ntot),
      |term AS (SELECT source, ns, bin,
      |    (CAST(o AS DOUBLE) - CAST(ns * nb AS DOUBLE) / CAST(n AS DOUBLE))
      |    * (CAST(o AS DOUBLE) - CAST(ns * nb AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(ns * nb AS DOUBLE) / CAST(n AS DOUBLE)) AS term
      |  FROM x)
      |SELECT source, max(ns) AS n_docs,
      |  list_sum(list(term ORDER BY bin)) AS chi2,
      |  list_sum(list(term ORDER BY bin)) > 9.488 AS is_anomalous
      |FROM term GROUP BY source ORDER BY source""".stripMargin

  // ------------- LSH parameter planner (q150)
  /** Should we re-band? For each candidate (bands, rows-per-band)
    * config of the 32-perm MinHash family, the expected fraction of
    * the CURRENTLY-CAUGHT near-dup pairs (q29's output) that config
    * would still catch — the S-curve 1-(1-j^r)^b evaluated against
    * the observed pair-similarity distribution, not a textbook grid.
    * The 100 TB use: before re-banding a standing signature index,
    * read off exactly how much recall a cheaper config sacrifices.
    *
    * Exactness: est_jaccard takes only m/32 values, so the pair frame
    * collapses to a ≤10-row histogram first; the S-curve powers are
    * UNROLLED multiplications (j·j·…, left-associated identically in
    * both engines — `pow()` is not bit-portable), and the expected-
    * recall fold runs in est order. */
  private def q150(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minhashCandidatePairs(Dedup.minhashSignatures(docs0(s, d), k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7)
    val hist = pairs.groupBy("est_jaccard").agg(count(lit(1)).as("n"))
      .agg(sort_array(collect_list(struct(col("est_jaccard"), col("n")))).as("h"),
           sum(col("n")).as("n_pairs"))
      .persistT // one tiny row, read once per candidate config
    def powC(x: Column, k: Int): Column = Iterator.fill(k)(x).reduceLeft(_ * _)
    LshConfigs.map { case (b, r) =>
      val pCatch = (v: Column) =>
        lit(1.0) - powC(lit(1.0) - powC(v.getField("est_jaccard"), r), b)
      hist.select(lit(b).as("bands"), lit(r).as("rows_per_band"), col("n_pairs"),
        (aggregate(col("h"), lit(0.0),
          (acc, v) => acc + pCatch(v) * v.getField("n").cast(DoubleType)) /
          col("n_pairs").cast(DoubleType)).as("expected_recall"))
    }.reduce(_ unionByName _)
      .sortedOut("bands")
  }

  private val LshConfigs = Seq((4, 8), (8, 4), (16, 2), (32, 1))

  private val q150Sql = {
    def powS(x: String, k: Int): String = Seq.fill(k)(x).mkString("(", " * ", ")")
    val arms = LshConfigs.map { case (b, r) =>
      val p = s"(1.0 - ${powS(s"(1.0 - ${powS("e", r)})", b)})"
      s"""SELECT $b AS bands, $r AS rows_per_band, n_pairs,
         |  list_sum(list($p * CAST(n AS DOUBLE) ORDER BY e)) / CAST(n_pairs AS DOUBLE) AS expected_recall
         |FROM h CROSS JOIN tot GROUP BY n_pairs""".stripMargin
    }
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |pr AS (SELECT est_jaccard AS e FROM est WHERE est_jaccard >= 0.7),
       |h AS (SELECT e, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY e),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_pairs FROM h)
       |${arms.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY bands""".stripMargin
  }

  // ------------- blocked fuzzy-match entity resolution (q153)
  /** The classic entity-resolution join the reference's name-match
    * (J2) is the exact-match special case of: candidate mentions
    * (first-3-token "names") are BLOCKED on their first token, and
    * only within-block pairs pay the edit-distance comparison —
    * levenshtein ≤ 3 matches survive. Blocking is what makes fuzzy
    * matching possible at all at corpus scale: the quadratic
    * comparison is confined to block-local pairs (bounded by the
    * hottest block, the same skew surface as an LSH bucket — cap or
    * salt a pathological block exactly like the banded join does).
    * Levenshtein is integer-exact cross-engine. */
  private def q153(s: SparkSession, d: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    val m = docs0(s, d).where(size(tk) >= 3)
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"),
        array_join(slice(col("tk"), 1, 3), " ").as("name"),
        element_at(col("tk"), 1).as("blk"))
      .persistT // both sides of the block-local self-join
    val a = m.select(col("blk"), col("doc_id").as("doc_a"), col("name").as("name_a"))
    val b = m.select(col("blk"), col("doc_id").as("doc_b"), col("name").as("name_b"))
    a.join(b, Seq("blk"))
      .where(col("doc_a") < col("doc_b"))
      // thresholded levenshtein: the DP early-exits once a row's min
      // cost exceeds 3 and returns -1 — O(k·n) per comparison instead
      // of O(n·m), the difference that matters when block-local pairs
      // number in the billions; equal to the full distance whenever
      // that distance is ≤ 3, so the oracle is unchanged
      .select(col("doc_a"), col("doc_b"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b"), 3).as("dist"))
      .where(col("dist") >= 0)
      .sortedOut("doc_a", "doc_b")
  }

  private val q153Sql =
    """WITH m AS (
      |  SELECT doc_id,
      |    array_to_string(tk[1:3], ' ') AS name,
      |    tk[1] AS blk
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents)
      |  WHERE len(tk) >= 3)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
      |FROM m a JOIN m b ON a.blk = b.blk AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.name, b.name) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------- MinHash estimator calibration (q154)
  /** Measure, don't guess, what the 32-perm estimate is worth: for
    * every LSH candidate pair, the EXACT token-set Jaccard next to the
    * signature-agreement estimate — mean bias, mean absolute error and
    * the overestimate count. This is the number that justifies (or
    * indicts) the est-threshold gates every dedup query in the family
    * uses; q150 plans the banding, this calibrates the estimator
    * itself.
    *
    * Scale shape: exact Jaccard is computed ONLY for the candidate
    * pairs (never all pairs) — the token-overlap join fans each pair
    * out by |toks(a)| and combines map-side; the final report
    * accumulates DECIMAL(38,0) sums of 9-decimal fixed-point
    * integers — exact, order-independent, map-side combinable, and
    * bounded at any corpus size (the r7 formulation collected the
    * ENTIRE scored-pair frame into one sort_array(collect_list) row
    * for bit-portable fp means: an executor OOM once the candidate
    * frame outgrows one task — VERDICT r7 "what's wrong" #2).
    *
    * Fixed-point contract: every per-pair quantity here is a RATIO of
    * small integers (est = m/32 with m the agreement count; exact =
    * i/u with u = |a∪b|), so e9-quantities floor(x·1e9) are computed
    * in PURE INTEGER arithmetic (no fp rounding anywhere before the
    * final report division) and both engines produce identical
    * integers; the means are off the true rational means by < 1e-9 —
    * the documented price of a report that no longer materializes the
    * pair frame in one row. ScaleOpsSpec pins old-vs-new agreement at
    * fixture scale. */
  private def q154(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minhashCandidatePairs(Dedup.minhashSignatures(docs0(s, d), k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7)
      .persistT // token-overlap join + two size joins + the fold
    val tk = docs0(s, d)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .distinct()
      .persistT // sizes + both overlap arms
    val sz = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs.select(col("doc_a"), col("doc_b"))
      .join(tk.select(col("doc_id").as("doc_a"), col("tok")), Seq("doc_a"))
      .join(tk.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    // m = 32·est is EXACT (est is an agreement count over 32, a small
    // dyadic rational, so the double round-trips); u = |a ∪ b|. All
    // three e9 fixed-point columns are integer div/abs over longs —
    // m·u ≤ 32·|vocab|² and i·1e9 ≤ |doc|·1e9 both fit comfortably.
    val scored = pairs
      .join(inter, Seq("doc_a", "doc_b"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("i"),
        (col("est_jaccard") * 32).cast(LongType).as("m"),
        (col("na") + col("nb") - col("i")).as("u"),
        (col("i").cast(DoubleType) /
          (col("na") + col("nb") - col("i")).cast(DoubleType)).as("exact"),
        col("est_jaccard"))
    val e9 = lit(1000000000L)
    scored
      .select(col("est_jaccard"), col("exact"),
        expr("(i * 1000000000) div u").as("exact_e9"),
        expr("(m * 1000000000) div 32").as("est_e9"),
        (abs(col("m") * col("u") - col("i") * 32) * e9).as("d_num"),
        (col("u") * 32).as("d_den"))
      .select(col("est_jaccard"), col("exact"),
        col("exact_e9").cast(DecimalType(38, 0)).as("exact_e9"),
        col("est_e9").cast(DecimalType(38, 0)).as("est_e9"),
        expr("(d_num div d_den)").cast(DecimalType(38, 0)).as("ae_e9"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("est_jaccard") > col("exact"), 1L).otherwise(0L)).as("n_over"),
        sum(col("exact_e9")).as("se"), sum(col("est_e9")).as("sm"),
        sum(col("ae_e9")).as("sa"))
      .select(col("n_pairs"), col("n_over"),
        (col("se").cast(DoubleType) /
          (col("n_pairs").cast(DoubleType) * 1e9)).as("mean_exact"),
        (col("sm").cast(DoubleType) /
          (col("n_pairs").cast(DoubleType) * 1e9)).as("mean_est"),
        (col("sa").cast(DoubleType) /
          (col("n_pairs").cast(DoubleType) * 1e9)).as("mae"))
  }

  private val q154Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |pr AS (SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.7),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
       |it AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS i
       |       FROM pr p
       |       JOIN toks ta ON ta.doc_id = p.doc_a
       |       JOIN toks tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
       |       GROUP BY 1, 2),
       |scored AS (SELECT p.doc_a, p.doc_b, p.est_jaccard,
       |    CAST(p.est_jaccard * 32 AS BIGINT) AS m, i,
       |    sa.n + sb.n - i AS u,
       |    CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS exact
       |  FROM pr p
       |  JOIN it ON it.doc_a = p.doc_a AND it.doc_b = p.doc_b
       |  JOIN sz sa ON sa.doc_id = p.doc_a
       |  JOIN sz sb ON sb.doc_id = p.doc_b)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN est_jaccard > exact THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
       |  CAST(sum((i * 1000000000) // u) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9) AS mean_exact,
       |  CAST(sum((m * 1000000000) // 32) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9) AS mean_est,
       |  CAST(sum((abs(m * u - i * 32) * 1000000000) // (u * 32)) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9) AS mae
       |FROM scored""".stripMargin

  // ------------- preference-pair construction (q157)
  /** DPO/RLHF data prep: within each (lang, source) group, pair the
    * highest-scoring document (chosen) with the lowest (rejected) under
    * q112's quality margin, reporting the score gap — the
    * pair-the-extremes recipe preference-training sets are built with
    * when no human labels exist. Groups too small to pair drop out.
    *
    * Scale shape: ONE map-side-combinable aggregate — chosen/rejected
    * travel as max/min of a (score, doc_id) struct, so nothing but two
    * structs per group crosses the shuffle (no window, no sort).
    * Struct ordering gives the deterministic tie-break (score, then
    * doc_id) in both engines. */
  private def q157(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    val scored = docs0(s, d).select(col("lang"), col("source"), col("doc_id"),
      graft.ops.LinearModel.margin(q112W, Seq(
        nTok.cast(DoubleType) / lit(256.0),
        TextFunctions.nonSpaceChars(col("text")) / nTok,
        stopHits / nTok)).as("score"))
    scored.groupBy("lang", "source")
      .agg(count(lit(1)).as("n"),
           max(struct(col("score"), col("doc_id"))).as("hi"),
           min(struct(col("score"), col("doc_id"))).as("lo"))
      .where(col("n") >= 2)
      .select(col("lang"), col("source"), col("n"),
        col("hi.doc_id").as("chosen_id"), col("lo.doc_id").as("rejected_id"),
        (col("hi.score") - col("lo.score")).as("score_gap"))
      .sortedOut("lang", "source")
  }

  private val q157Sql =
    """WITH s AS (
      |  SELECT lang, source, doc_id,
      |    -1.25 + 2.0 * (CAST(len(toks) AS DOUBLE) / 256.0)
      |          + 0.25 * (length(regexp_replace(text, '\s', '', 'g')) / len(toks))
      |          + -3.5 * (len(list_filter(toks,
      |                      t -> t IN ('the','a','of','and','to','in','is'))) / len(toks))
      |      AS score
      |  FROM (SELECT *, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents)),
      |hi AS (SELECT lang, source, doc_id AS chosen_id, score AS hi_score FROM (
      |         SELECT *, row_number() OVER (PARTITION BY lang, source
      |                     ORDER BY score DESC, doc_id DESC) AS rn FROM s)
      |       WHERE rn = 1),
      |lo AS (SELECT lang, source, doc_id AS rejected_id, score AS lo_score FROM (
      |         SELECT *, row_number() OVER (PARTITION BY lang, source
      |                     ORDER BY score ASC, doc_id ASC) AS rn FROM s)
      |       WHERE rn = 1),
      |n AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1, 2)
      |SELECT n.lang, n.source, n.n, chosen_id, rejected_id,
      |       hi_score - lo_score AS score_gap
      |FROM n
      |JOIN hi ON hi.lang = n.lang AND hi.source = n.source
      |JOIN lo ON lo.lang = n.lang AND lo.source = n.source
      |WHERE n.n >= 2
      |ORDER BY n.lang, n.source""".stripMargin

  // ------------- drop-reason audit (q158)
  /** The curation pipeline's accountability report: every document gets
    * the FIRST gate that would drop it — too_short (q25's length
    * floor), repetitive (q75's Gopher rules), stopword_heavy (q25's
    * ratio cut), low_score (q112's classifier margin) — or `kept`, and
    * the output is the per-reason census. This is the table a curation
    * run publishes so a corpus consumer can see where the tokens went;
    * the fixed gate ORDER is the point (each doc counted once, under
    * the first reason — re-ordering gates changes the attribution, not
    * the kept set).
    *
    * Scale shape: one pass computes every per-doc signal (the
    * repetition stats join is doc-keyed like q75), the census combines
    * map-side to ≤5 rows, total rides a 1-row broadcast. */
  private def q158(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    val scored = docs0(s, d).select(col("doc_id"), nTok.as("n_tok"),
      (stopHits / nTok).as("stop_ratio"),
      graft.ops.LinearModel.margin(q112W, Seq(
        nTok.cast(DoubleType) / lit(256.0),
        TextFunctions.nonSpaceChars(col("text")) / nTok,
        stopHits / nTok)).as("score"))
    val rep = graft.text.QualityOps.repetitionStats(docs0(s, d))
      .select(col("doc_id"), col("is_repetitive"))
    val reason = when(col("n_tok") < 5, "too_short")
      .when(coalesce(col("is_repetitive"), lit(false)), "repetitive")
      .when(col("stop_ratio") > 0.5, "stopword_heavy")
      .when(col("score") < 0.0, "low_score")
      .otherwise("kept")
    val census = scored.join(rep, Seq("doc_id"), "left")
      .select(reason.as("reason"))
      .groupBy("reason").agg(count(lit(1)).as("n_docs"))
    census.crossJoin(broadcast(census.agg(sum(col("n_docs")).as("nd"))))
      .select(col("reason"), col("n_docs"),
        (col("n_docs").cast(DoubleType) / col("nd").cast(DoubleType)).as("share"))
      .sortedOut("reason")
  }

  private val q158Sql =
    """WITH t AS (SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS g FROM t),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
      |       FROM t WHERE len(tk) >= 2),
      |tc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY 1, 2),
      |tp AS (SELECT doc_id, max(c) AS top_tok, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS nd_tok FROM tc GROUP BY 1),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |bp AS (SELECT doc_id, max(c) AS top_bg, CAST(sum(c) AS BIGINT) AS n_bg FROM bc GROUP BY 1),
      |sig AS (
      |  SELECT t.doc_id,
      |    CAST(len(tk) AS BIGINT) AS n_tok,
      |    len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) / len(tk) AS stop_ratio,
      |    -1.25 + 2.0 * (CAST(len(tk) AS DOUBLE) / 256.0)
      |          + 0.25 * (length(regexp_replace(text, '\s', '', 'g')) / len(tk))
      |          + -3.5 * (len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) / len(tk)) AS score,
      |    coalesce(tp.top_tok / tp.n_tok > 0.12
      |          OR 1 - tp.nd_tok / tp.n_tok > 0.6
      |          OR bp.top_bg / bp.n_bg > 0.06, false) AS is_repetitive
      |  FROM t LEFT JOIN tp ON tp.doc_id = t.doc_id
      |         LEFT JOIN bp ON bp.doc_id = t.doc_id),
      |census AS (
      |  SELECT CASE WHEN n_tok < 5 THEN 'too_short'
      |              WHEN is_repetitive THEN 'repetitive'
      |              WHEN stop_ratio > 0.5 THEN 'stopword_heavy'
      |              WHEN score < 0.0 THEN 'low_score'
      |              ELSE 'kept' END AS reason,
      |         CAST(count(*) AS BIGINT) AS n_docs
      |  FROM sig GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nd FROM census)
      |SELECT reason, n_docs, CAST(n_docs AS DOUBLE) / CAST(nd AS DOUBLE) AS share
      |FROM census CROSS JOIN tot ORDER BY reason""".stripMargin

  // ------------- vocabulary growth / Heaps-law curve (q159)
  /** How fast does the corpus stop teaching new words: for doc-count
    * prefixes (in doc_id order), total token volume vs distinct
    * vocabulary seen — the Heaps-law curve that says when additional
    * crawl volume stops buying lexical coverage (and sizes the
    * tokenizer's vocab budget, q79/q104's knob).
    *
    * Scale shape: each token type reduces to its FIRST doc
    * (min(doc_id) — one map-side-combinable pass over exploded
    * tokens); the curve is a ≤|prefix-list| literal explode over that
    * |vocab|-sized frame plus one over the per-doc counts. Nothing
    * quadratic, no window over the corpus. */
  private def q159(s: SparkSession, d: String): DataFrame = {
    val prefixes = Seq(50L, 100L, 200L, 400L, 800L, 1600L, 3200L, 6400L)
    val pArr = array(prefixes.map(lit): _*)
    val first = docs0(s, d)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("fd"))
    val vocab = first.select(col("fd"), explode(pArr).as("prefix_docs"))
      .where(col("fd") < col("prefix_docs"))
      .groupBy("prefix_docs").agg(count(lit(1)).as("vocab"))
    val seen = docs0(s, d)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"))
      .select(col("doc_id"), col("n_tok"), explode(pArr).as("prefix_docs"))
      .where(col("doc_id") < col("prefix_docs"))
      .groupBy("prefix_docs").agg(sum(col("n_tok")).as("tokens_seen"))
    val w = Window.orderBy(col("prefix_docs"))
    // limit(16) cannot truncate (8 literal prefixes by construction);
    // it makes the lag window's child statically bounded for planLint
    seen.join(vocab, Seq("prefix_docs")).limit(16)
      .withColumn("new_vocab", col("vocab") - coalesce(lag(col("vocab"), 1).over(w), lit(0L)))
      .sortedOut("prefix_docs")
  }

  private val q159Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |f AS (SELECT tok, min(doc_id) AS fd FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY tok),
      |p AS (SELECT unnest([50, 100, 200, 400, 800, 1600, 3200, 6400]) AS prefix_docs),
      |v AS (SELECT CAST(prefix_docs AS BIGINT) AS prefix_docs, CAST(count(*) AS BIGINT) AS vocab
      |      FROM f CROSS JOIN p WHERE fd < prefix_docs GROUP BY 1),
      |sn AS (SELECT CAST(prefix_docs AS BIGINT) AS prefix_docs, CAST(sum(len(tk)) AS BIGINT) AS tokens_seen
      |       FROM t CROSS JOIN p WHERE doc_id < prefix_docs GROUP BY 1)
      |SELECT sn.prefix_docs, tokens_seen, vocab,
      |  CAST(vocab - coalesce(lag(vocab) OVER (ORDER BY sn.prefix_docs), 0) AS BIGINT) AS new_vocab
      |FROM sn JOIN v ON v.prefix_docs = sn.prefix_docs
      |ORDER BY sn.prefix_docs""".stripMargin

  // ------------- quality-aware dedup survivor (q160)
  /** Near-dup dedup that keeps the BEST copy, not the first: q48's
    * clusters re-resolved with q112's quality margin choosing each
    * cluster's survivor (max (score, doc_id) struct — one map-side-
    * combinable aggregate, no window), reported AGAINST the min-id
    * policy: how many clusters changed survivor and what the kept
    * token budget is under each. Re-hosted copies usually differ in
    * boilerplate wrap, so "first crawled" and "best quality" genuinely
    * diverge — this is the table that justifies the policy switch.
    *
    * Scale shape: everything after cluster resolution is doc-keyed
    * joins plus a cluster-keyed aggregate; survivors travel as one
    * struct per cluster. */
  private def q160(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, k = 32), bands = 4, rowsPerBand = 8, minEst = 0.9)
    val clusters = Dedup.nearDupClusters(pairs)
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    val scored = docs.select(col("doc_id"), nTok.cast(LongType).as("n_tok"),
      graft.ops.LinearModel.margin(q112W, Seq(
        nTok.cast(DoubleType) / lit(256.0),
        TextFunctions.nonSpaceChars(col("text")) / nTok,
        stopHits / nTok)).as("score"))
    val memb = scored.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val per = memb.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
           max(struct(col("score"), col("doc_id"), col("n_tok"))).as("hi"),
           sum(when(col("doc_id") === col("cluster"), col("n_tok")).otherwise(0L)).as("minid_tok"))
    per.agg(
        count(lit(1)).as("n_kept"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_multi"),
        sum(when(col("n") >= 2 && col("hi.doc_id") =!= col("cluster"), 1L).otherwise(0L)).as("n_upgraded"),
        sum(col("hi.n_tok")).as("kept_tokens_best"),
        sum(col("minid_tok")).as("kept_tokens_minid"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_total"))))
  }

  private val q160Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |p AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.9),
       |nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
       |${componentLabelCtes()}
       |, sc AS (
       |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
       |    -1.25 + 2.0 * (CAST(len(tk) AS DOUBLE) / 256.0)
       |          + 0.25 * (length(regexp_replace(text, '\\s', '', 'g')) / len(tk))
       |          + -3.5 * (len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) / len(tk)) AS score
       |  FROM (SELECT *, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents)),
       |memb AS (
       |  SELECT sc.doc_id, sc.n_tok, sc.score, coalesce(l.cluster, sc.doc_id) AS cluster
       |  FROM sc LEFT JOIN labels l ON l.doc_id = sc.doc_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY score DESC, doc_id DESC) AS rn
       |  FROM memb),
       |per AS (
       |  SELECT cluster,
       |    CAST(count(*) AS BIGINT) AS n,
       |    max(CASE WHEN rn = 1 THEN doc_id END) AS best_id,
       |    max(CASE WHEN rn = 1 THEN n_tok END) AS best_tok,
       |    CAST(sum(CASE WHEN doc_id = cluster THEN n_tok ELSE 0 END) AS BIGINT) AS minid_tok
       |  FROM ranked GROUP BY cluster)
       |SELECT
       |  CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
       |  CAST(sum(CASE WHEN n >= 2 AND best_id <> cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_upgraded,
       |  CAST(sum(best_tok) AS BIGINT) AS kept_tokens_best,
       |  CAST(sum(minid_tok) AS BIGINT) AS kept_tokens_minid,
       |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_total
       |FROM per""".stripMargin

  // ------------- exact classifier ROC-AUC (q161)
  /** The threshold-free verdict on q112's quality margin: exact
    * Mann-Whitney AUC against an INDEPENDENT ground truth (q75's
    * repetitiveness flag, inverted — "clean" is positive; q25's label
    * is degenerate on this fixture) — AUC =
    * (Σ midrank(positives) − n₊(n₊+1)/2) / (n₊·n₋), with midranks for
    * tied scores, NULL-guarded for one-class inputs. Complements
    * q139's calibration bins: calibration says where to put the cut,
    * AUC says whether the score ranks at all.
    *
    * Scale + exactness: the global ranking rides
    * [[graft.ops.RelationalOps.globalRowNumber]] (range partition +
    * prefix offsets — no single-partition window); midranks are
    * (min+max)/2 per tied score. Every term is a dyadic rational
    * (halves) far below 2^52, so the double sums are EXACT and
    * order-independent — no sorted fold needed anywhere. */
  private def q161(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val stopHits = TextFunctions.hitCount(toks, TextFunctions.Stopwords)
    // ground truth = NOT repetitive (q75's flag) — q25's quality label
    // is degenerate on this fixture (every doc passes), and a
    // one-class AUC is undefined
    val rep = graft.text.QualityOps.repetitionStats(docs0(s, d))
      .select(col("doc_id"), col("is_repetitive"))
    val scored = docs0(s, d).select(col("doc_id"),
        graft.ops.LinearModel.margin(q112W, Seq(
          nTok.cast(DoubleType) / lit(256.0),
          TextFunctions.nonSpaceChars(col("text")) / nTok,
          stopHits / nTok)).as("score"))
      .join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("score"),
        (!coalesce(col("is_repetitive"), lit(false))).as("label"))
    val ranked = graft.ops.RelationalOps.globalRowNumber(
      scored, Seq(col("score").asc, col("doc_id").asc), "rn")
    val mid = ranked.groupBy("score")
      .agg(((min(col("rn")) + max(col("rn"))).cast(DoubleType) / 2.0).as("midrank"))
    ranked.join(mid, Seq("score"))
      .agg(sum(when(col("label"), col("midrank")).otherwise(0.0)).as("prs"),
           sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
           sum(when(!col("label"), 1L).otherwise(0L)).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("prs") - col("n_pos").cast(DoubleType) * (col("n_pos") + 1).cast(DoubleType) / 2.0) /
            (col("n_pos").cast(DoubleType) * col("n_neg").cast(DoubleType))).as("auc"))
  }

  private val q161Sql =
    """WITH t AS (SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS g FROM t),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
      |       FROM t WHERE len(tk) >= 2),
      |tc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY 1, 2),
      |tp AS (SELECT doc_id, max(c) AS top_tok, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS nd_tok FROM tc GROUP BY 1),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |bp AS (SELECT doc_id, max(c) AS top_bg, CAST(sum(c) AS BIGINT) AS n_bg FROM bc GROUP BY 1),
      |s AS (
      |  SELECT t.doc_id,
      |    -1.25 + 2.0 * (CAST(len(tk) AS DOUBLE) / 256.0)
      |          + 0.25 * (length(regexp_replace(text, '\s', '', 'g')) / len(tk))
      |          + -3.5 * (len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) / len(tk)) AS score,
      |    NOT coalesce(tp.top_tok / tp.n_tok > 0.12
      |          OR 1 - tp.nd_tok / tp.n_tok > 0.6
      |          OR bp.top_bg / bp.n_bg > 0.06, false) AS label
      |  FROM t LEFT JOIN tp ON tp.doc_id = t.doc_id
      |         LEFT JOIN bp ON bp.doc_id = t.doc_id),
      |r AS (SELECT *, CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rn FROM s),
      |m AS (SELECT score, CAST(min(rn) + max(rn) AS DOUBLE) / 2.0 AS midrank FROM r GROUP BY score),
      |j AS (SELECT r.label, m.midrank FROM r JOIN m ON m.score = r.score),
      |a AS (SELECT
      |    sum(CASE WHEN label THEN midrank ELSE 0.0 END) AS prs,
      |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      |  FROM j)
      |SELECT n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    (prs - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE) / 2.0)
      |      / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END AS auc
      |FROM a""".stripMargin

  // ------------- corpus dataset card (q163)
  /** The one-row datasheet a corpus release publishes: volume (docs,
    * tokens, chars), spread (languages, sources), hygiene (exact-dup
    * docs, repetitive fraction) and the mean document length — every
    * number a dataset card's "composition" section asks for, computed
    * in one pass plus the doc-keyed repetition join. The language list
    * itself ships sorted-joined (bounded by |langs|). */
  private def q163(s: SparkSession, d: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    val base = docs0(s, d).select(size(tk).cast(LongType).as("n_tok"),
        col("n_chars"), col("lang"), col("source"), md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("n_tokens"),
           sum(col("n_chars")).as("n_chars"),
           countDistinct(col("lang")).as("n_langs"),
           countDistinct(col("source")).as("n_sources"),
           countDistinct(col("h")).as("n_distinct_texts"),
           array_join(sort_array(collect_set(col("lang"))), ",").as("langs"))
    val rep = graft.text.QualityOps.repetitionStats(docs0(s, d))
      .agg(sum(when(col("is_repetitive"), 1L).otherwise(0L)).as("n_rep"))
    base.crossJoin(broadcast(rep))
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_sources"), col("langs"),
        (col("n_docs") - col("n_distinct_texts")).as("n_exact_dup_docs"),
        (col("n_tokens").cast(DoubleType) / col("n_docs").cast(DoubleType)).as("mean_doc_tokens"),
        (col("n_rep").cast(DoubleType) / col("n_docs").cast(DoubleType)).as("pct_repetitive"))
  }

  private val q163Sql =
    """WITH t AS (SELECT doc_id, text, n_chars, lang, source,
      |             regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS g FROM t),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
      |       FROM t WHERE len(tk) >= 2),
      |tc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY 1, 2),
      |tp AS (SELECT doc_id, max(c) AS top_tok, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS nd_tok FROM tc GROUP BY 1),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |bp AS (SELECT doc_id, max(c) AS top_bg, CAST(sum(c) AS BIGINT) AS n_bg FROM bc GROUP BY 1),
      |rep AS (SELECT CAST(count(*) AS BIGINT) AS n_rep
      |        FROM tp JOIN bp USING (doc_id)
      |        WHERE tp.top_tok / tp.n_tok > 0.12
      |           OR 1 - tp.nd_tok / tp.n_tok > 0.6
      |           OR bp.top_bg / bp.n_bg > 0.06),
      |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
      |    array_to_string(list(DISTINCT lang ORDER BY lang), ',') AS langs
      |  FROM t)
      |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources, langs,
      |  n_docs - n_distinct_texts AS n_exact_dup_docs,
      |  CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_doc_tokens,
      |  CAST(n_rep AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pct_repetitive
      |FROM base CROSS JOIN rep""".stripMargin

  // ------------- dup-graph transitivity audit (q164)
  /** [[graft.ops.Graph.triangleStats]] on the near-dup CANDIDATE graph
    * (q29's est ≥ 0.7 pairs): a genuine similarity relation closes its
    * wedges (a~b and b~c should mean a~c), so LOW clustering here is
    * the early warning that the threshold is chaining unrelated
    * documents — exactly the over-merge risk union-find then
    * amplifies, caught BEFORE dedupByClusters drops the survivors.
    * Complements q95's degree histogram with the closure view. */
  private def q164(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minhashCandidatePairs(Dedup.minhashSignatures(docs0(s, d), k = 32),
      bands = 4, rowsPerBand = 8, minEst = 0.7)
    graft.ops.Graph.triangleStats(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
  }

  private val q164Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |pr AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.7),
       |und AS (SELECT DISTINCT least(doc_a, doc_b) AS u, greatest(doc_a, doc_b) AS v
       |        FROM pr WHERE doc_a <> doc_b),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
       |        FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
       |        GROUP BY node),
       |tri AS (SELECT CAST(count(*) AS BIGINT) AS t
       |        FROM und e1
       |        JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
       |        JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |               CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
       |SELECT n_nodes, n_edges, n_wedges, t AS n_triangles,
       |  CAST(t AS DOUBLE) * 3.0 / CAST(n_wedges AS DOUBLE) AS clustering
       |FROM agg CROSS JOIN ne CROSS JOIN tri""".stripMargin

  // ------------- epoch-capped token-budget allocation (q166)
  /** The "how many tokens from each source" step of a training-mix
    * plan: [[graft.ops.Sampling.waterFillAllocation]] over per-source
    * token counts — budget 90% of the corpus, max 1 epoch per source
    * (the fixture's two smallest sources saturate, exercising BOTH
    * allocation arms against the oracle).
    * Small sources saturate at their full token count (capped=true, 1
    * epoch); every remaining source contributes the SAME water level λ
    * of tokens — uniform mixing subject to the epoch constraint, the
    * allocation shape Chinchilla-style data-constrained mixes use.
    *
    * Scale shape: ONE map-side-combining count pass over the corpus;
    * everything after runs on the |S|-row aggregate (the closed-form
    * capped-prefix window — no iteration). Integer arithmetic until
    * the single λ division, so the doubles hash-match the oracle. */
  private def q166(s: SparkSession, d: String): DataFrame = {
    val counts = docs0(s, d).groupBy("source")
      .agg(sum(TextFunctions.tokenCount(col("text")).cast(LongType)).as("n_tokens"))
    graft.ops.Sampling.waterFillAllocation(counts, "source", "n_tokens",
        budget = expr("(total_n * 9) div 10"), maxEpochs = 1)
      .sortedOut("stratum")
  }

  private val q166Sql =
    """WITH t AS (SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |c AS (SELECT source AS stratum, CAST(sum(len(tk)) AS BIGINT) AS n,
      |             CAST(sum(len(tk)) * 1 AS BIGINT) AS cap FROM t GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_n, CAST(count(*) AS BIGINT) AS n_strata FROM c),
      |bb AS (SELECT n_strata, (total_n * 9) // 10 AS b FROM tot),
      |r AS (SELECT stratum, n, cap,
      |        CAST(row_number() OVER (ORDER BY cap, stratum) AS BIGINT) AS rn,
      |        CAST(sum(cap) OVER (ORDER BY cap, stratum ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
      |      FROM c),
      |f AS (SELECT r.*, bb.b, bb.n_strata,
      |        (cap * (n_strata - rn) <= b - prefix) AS capped
      |      FROM r CROSS JOIN bb),
      |lvl AS (SELECT CASE WHEN max(n_strata) > coalesce(max(CASE WHEN capped THEN rn END), 0)
      |          THEN CAST(max(b) - coalesce(sum(CASE WHEN capped THEN cap END), 0) AS DOUBLE)
      |               / CAST(max(n_strata) - coalesce(max(CASE WHEN capped THEN rn END), 0) AS DOUBLE)
      |        END AS lambda FROM f)
      |SELECT stratum, n, cap, capped,
      |  CASE WHEN capped THEN CAST(cap AS DOUBLE) ELSE lambda END AS alloc,
      |  (CASE WHEN capped THEN CAST(cap AS DOUBLE) ELSE lambda END) / CAST(n AS DOUBLE) AS epochs
      |FROM f CROSS JOIN lvl ORDER BY stratum""".stripMargin

  // ------------- per-source score normalization (q169)
  /** Rank-percentile normalization of a quality signal WITHIN each
    * source — the step that makes scores comparable ACROSS sources
    * before a global threshold (a raw cutoff on heterogeneous sources
    * silently keeps whichever feed scores generously; after per-source
    * normalization every source contributes its own top x%). Signal
    * here: token count (swap in any margin — the mechanics are the
    * rank, not the score).
    *
    * pct = (2·rank − 1) / (2·nₛ) — the midrank percentile, one
    * division of exact integers per row; decile = ((2·rank−1)·5) div nₛ
    * stays pure integer (equals floor(pct·10), always ≤ 9). The window
    * partitions by source — the per-source sort is the operator; a
    * pathologically hot source rides the same salting/range disciplines
    * as every keyed sort in this repo. */
  private def q169(s: SparkSession, d: String): DataFrame = {
    val t = docs0(s, d).select(col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"))
    val w = Window.partitionBy("source").orderBy(col("n_tok"), col("doc_id"))
    t.withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy("source")))
      .select(col("doc_id"), col("source"), col("n_tok"),
        ((col("rn") * 2 - 1).cast(DoubleType) / (col("ns") * 2).cast(DoubleType)).as("pct"),
        // `div`, not Column `/`: Column division is IEEE-double Divide
        // and only matched the documented pure-integer contract because
        // fl((2r-1)·5/n) can't round across an integer boundary at
        // realistic n (ADVICE r7 #4) — integer division makes the
        // bit-portability argument unconditional.
        expr("((rn * 2 - 1) * 5) div ns").cast(LongType).as("decile"))
      .sortedOutWide("doc_id")
  }

  private val q169Sql =
    """WITH t AS (SELECT doc_id, source,
      |             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |           FROM documents),
      |r AS (SELECT doc_id, source, n_tok,
      |        CAST(row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS BIGINT) AS rn,
      |        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
      |      FROM t)
      |SELECT doc_id, source, n_tok,
      |  CAST(rn * 2 - 1 AS DOUBLE) / CAST(ns * 2 AS DOUBLE) AS pct,
      |  ((rn * 2 - 1) * 5) // ns AS decile
      |FROM r ORDER BY doc_id""".stripMargin

  // ------------- syndication direction matrix (q170)
  /** WHO copies WHOM: every near-dup candidate pair (q29's est ≥ 0.5)
    * votes an ordered (origin → copy) edge between its SOURCES, origin
    * = the pair's lower doc_id (earlier ingest — the same survivor
    * convention as the dedup family). The aggregated |S|×|S| matrix is
    * the mirror/syndication map that q142's symmetric gram-overlap
    * can't give: direction. Feeds crawl-budget decisions (stop
    * recrawling the copier, keep the origin).
    *
    * Scale shape: pair generation IS q29 (banded join, skew-capped);
    * the two source lookups are hash joins on doc_id; the matrix
    * aggregate is map-side-combinable down to ≤|S|² rows. */
  private def q170(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs0(s, d), k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.5)
      .select(col("doc_a"), col("doc_b"))
    val src = docs0(s, d).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_origin")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_copy")), Seq("doc_b"))
      .groupBy("src_origin", "src_copy")
      .agg(count(lit(1)).as("n_pairs"))
      .sortedOut("src_origin", "src_copy")
  }

  private val q170Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |pr AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.5)
       |SELECT da.source AS src_origin, db.source AS src_copy,
       |       CAST(count(*) AS BIGINT) AS n_pairs
       |FROM pr JOIN documents da ON da.doc_id = pr.doc_a
       |        JOIN documents db ON db.doc_id = pr.doc_b
       |GROUP BY 1, 2 ORDER BY src_origin, src_copy""".stripMargin

  // ------------- token-mass concentration by length decile (q171)
  /** The Lorenz view of the corpus: exact length deciles (global rank
    * under (n_tokens, doc_id) via [[graft.ops.RelationalOps
    * .globalRowNumber]] — never a single-partition window) and each
    * decile's token mass + cumulative share. Answers "what fraction of
    * the token budget do the longest 10% of documents carry" — the
    * number that sizes a length cap before it's imposed (q158 then
    * audits what the cap dropped).
    *
    * decile = floor((rn−1)·10/N), double-exact below 10^15 docs (q147's
    * argument); cumulative share is a window over the 10-row decile
    * frame, integer sums with ONE division per row. */
  private def q171(s: SparkSession, d: String): DataFrame = {
    val t = docs0(s, d).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"))
    val ranked = graft.ops.RelationalOps.globalRowNumber(
      t, Seq(col("n_tok").asc, col("doc_id").asc), "rn")
    val tot = t.agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("ntt"))
    val byDec = ranked.crossJoin(broadcast(tot))
      .select(floor((col("rn") - 1) * 10 / col("nd")).as("decile"),
        col("n_tok"), col("ntt"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        max(col("ntt")).as("ntt"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // limit(16) cannot truncate (decile ∈ 0..9 by construction); it
    // makes the cumulative window's child statically bounded
    byDec.limit(16).withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("decile"), col("n_docs"), col("n_tokens"),
        (col("cum_tokens").cast(DoubleType) / col("ntt").cast(DoubleType)).as("cum_token_share"))
      .sortedOut("decile")
  }

  private val q171Sql =
    """WITH t AS (SELECT doc_id,
      |             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |           FROM documents),
      |r AS (SELECT n_tok, CAST(row_number() OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS rn FROM t),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n_tok) AS BIGINT) AS ntt FROM t),
      |d AS (SELECT CAST(floor(CAST((rn - 1) * 10 AS DOUBLE) / CAST(nd AS DOUBLE)) AS BIGINT) AS decile,
      |             n_tok, ntt
      |      FROM r CROSS JOIN tot),
      |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(n_tok) AS BIGINT) AS n_tokens, max(ntt) AS ntt
      |      FROM d GROUP BY decile)
      |SELECT decile, n_docs, n_tokens,
      |  CAST(CAST(sum(n_tokens) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
      |    / CAST(ntt AS DOUBLE) AS cum_token_share
      |FROM g ORDER BY decile""".stripMargin

  // ------------- distribution-matching resample (q173)
  /** Reshape the corpus to a TARGET length profile by downsampling
    * only — [[graft.ops.Sampling.distributionMatchFractions]] (uniform
    * target over q149's five length bins) + the deterministic
    * [[graft.ops.Sampling.mixtureSample]] hash filter. The scarcest
    * bin keeps everything; every other bin trims to proportion — the
    * "match the reference corpus profile" step (length here; swap the
    * bin column for language/domain/quality-decile unchanged).
    *
    * Determinism bridge: the per-bin thresholds are floor(f·2⁶⁰)
    * longs built from division/min of exact integer counts — the q127
    * contract — so the kept SET (pinned by the id checksum) matches
    * the oracle exactly. */
  private def q173(s: SparkSession, d: String): DataFrame = {
    val nTok = TextFunctions.tokenCount(col("text"))
    val bin = when(nTok <= 24, 0).when(nTok <= 48, 1)
      .when(nTok <= 72, 2).when(nTok <= 96, 3).otherwise(4)
    val t = docs0(s, d).select(col("doc_id"), bin.as("bin")).persistT
    val target = (0 to 4).map(b => b.toString -> 0.2).toMap
    val fr = graft.ops.Sampling.distributionMatchFractions(
      t, col("bin").cast("string"), target)
    val kept = graft.ops.Sampling.mixtureSample(
      t, col("bin").cast("string"), col("doc_id"), fr)
    t.groupBy("bin").agg(count(lit(1)).as("n_docs"))
      .join(kept.groupBy("bin").agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("kept_id_sum")), Seq("bin"))
      .sortedOut("bin")
  }

  private val q173Sql = {
    val h = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN nt <= 24 THEN 0 WHEN nt <= 48 THEN 1 WHEN nt <= 72 THEN 2
       |         WHEN nt <= 96 THEN 3 ELSE 4 END AS bin
       |  FROM (SELECT doc_id,
       |          len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS nt
       |        FROM documents)),
       |c0 AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
       |cc AS (SELECT min(CAST(n AS DOUBLE) / 0.2) AS c FROM c0),
       |fr AS (SELECT bin,
       |         CAST(floor(least(1.0, c * 0.2 / CAST(n AS DOUBLE))
       |                    * 1152921504606846976.0) AS BIGINT) AS thr
       |       FROM c0 CROSS JOIN cc),
       |kept AS (SELECT t.doc_id, t.bin FROM t JOIN fr USING (bin) WHERE $h < fr.thr)
       |SELECT t2.bin, CAST(count(*) AS BIGINT) AS n_docs, k.n_kept, k.kept_id_sum
       |FROM t t2 JOIN (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n_kept,
       |         CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
       |  FROM kept GROUP BY 1) k USING (bin)
       |GROUP BY t2.bin, k.n_kept, k.kept_id_sum ORDER BY bin""".stripMargin
  }

  // ------------- exact Spearman between curation signals (q174)
  /** Does one quality signal just restate another? Exact Spearman rank
    * correlation between doc length (tokens) and lexical diversity
    * (distinct tokens) — the audit that catches a "quality" score
    * secretly measuring length (the classic curation-filter bias).
    *
    * Exactness: ranks are midranks with ties, carried DOUBLED so they
    * stay integers (2·midrank = min(rn)+max(rn) over the tie group);
    * the five sufficient sums accumulate as DECIMAL — exact and
    * order-independent — and ρ is assembled from their doubles with
    * the same IEEE ops on both engines. Ranks ride
    * [[graft.ops.RelationalOps.globalRowNumber]], never a
    * single-partition window. */
  private def q174(s: SparkSession, d: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    val t = docs0(s, d).select(col("doc_id"),
        size(tk).cast(LongType).as("x"),
        size(array_distinct(tk)).cast(LongType).as("y"))
      .persistT // two rank passes + the moment aggregate
    def mr2(vCol: String, out: String): DataFrame = {
      val ranked = graft.ops.RelationalOps.globalRowNumber(
        t.select(col("doc_id"), col(vCol)), Seq(col(vCol).asc, col("doc_id").asc), "rn")
      val groups = ranked.groupBy(vCol)
        .agg((min(col("rn")) + max(col("rn"))).as(out))
      ranked.select(col("doc_id"), col(vCol))
        .join(groups, Seq(vCol)).select(col("doc_id"), col(out))
    }
    val rx = mr2("x", "mrx"); val ry = mr2("y", "mry")
    val m = rx.join(ry, Seq("doc_id"))
      .select(col("mrx").cast(DecimalType(19, 0)).as("mrx"),
              col("mry").cast(DecimalType(19, 0)).as("mry"))
      .agg(count(lit(1)).as("n"),
        sum(col("mrx")).as("sx"), sum(col("mry")).as("sy"),
        sum(col("mrx") * col("mry")).as("sxy"),
        sum(col("mrx") * col("mrx")).as("sxx"),
        sum(col("mry") * col("mry")).as("syy"))
    m.select(col("n"),
      ((col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
        col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
       sqrt((col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
             col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
            (col("n").cast(DoubleType) * col("syy").cast(DoubleType) -
             col("sy").cast(DoubleType) * col("sy").cast(DoubleType)))).as("spearman_rho"))
  }

  private val q174Sql =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(tk) AS BIGINT) AS x, CAST(len(list_distinct(tk)) AS BIGINT) AS y
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents)),
      |rxr AS (SELECT doc_id, x, CAST(row_number() OVER (ORDER BY x, doc_id) AS BIGINT) AS rn FROM t),
      |rxg AS (SELECT x, min(rn) + max(rn) AS mrx FROM rxr GROUP BY x),
      |rx AS (SELECT doc_id, mrx FROM rxr JOIN rxg USING (x)),
      |ryr AS (SELECT doc_id, y, CAST(row_number() OVER (ORDER BY y, doc_id) AS BIGINT) AS rn FROM t),
      |ryg AS (SELECT y, min(rn) + max(rn) AS mry FROM ryr GROUP BY y),
      |ry AS (SELECT doc_id, mry FROM ryr JOIN ryg USING (y)),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        sum(mrx) AS sx, sum(mry) AS sy,
      |        sum(mrx * mry) AS sxy, sum(mrx * mrx) AS sxx, sum(mry * mry) AS syy
      |      FROM rx JOIN ry USING (doc_id))
      |SELECT n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  AS spearman_rho
      |FROM m""".stripMargin

  // ------------- unigram negative-sampling table (q175)
  /** The count^0.75 unigram distribution word2vec-style negative
    * sampling draws from — per token: count, weight = count^{3/4},
    * draw probability. The ¾ power is computed as sqrt(c·sqrt(c)):
    * sqrt and multiply are CORRECTLY-ROUNDED IEEE ops, so the weights
    * are bit-portable where a pow(c, 0.75) call would not be (libm
    * pow differs across engines — the q150/q155 shared-literal problem
    * solved structurally).
    *
    * The normalizer Z accumulates as a DECIMAL(38,0) sum of 6-decimal
    * fixed-point weights floor(w·1e6) — exact, order-independent, and
    * bounded at any vocabulary size (the r7 formulation collected the
    * whole vocabulary into one sort_array(collect_list) row for a
    * bit-portable ordered fold: an executor OOM at real vocab scale —
    * VERDICT r7 "what's wrong" #2). Every step before the final
    * division is either a correctly-rounded IEEE op (sqrt, multiply,
    * floor) or integer arithmetic, so both engines produce the
    * identical Z; probs shift by < 1e-6/Z vs the r7 fold — the
    * documented price of a normalizer that never materializes the
    * vocabulary in one row. ScaleOpsSpec pins old-vs-new agreement. */
  private def q175(s: SparkSession, d: String): DataFrame = {
    val counts = docs0(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val wExpr = sqrt(col("c").cast(DoubleType) * sqrt(col("c").cast(DoubleType)))
    val z = counts
      .select(floor(wExpr * 1000000).cast(DecimalType(38, 0)).as("wq"))
      .agg((sum(col("wq")).cast(DoubleType) / 1e6).as("z"))
    counts.crossJoin(broadcast(z))
      .select(col("tok"), col("c"), wExpr.as("weight"),
        (wExpr / col("z")).as("prob"))
      .sortedOut("tok")
  }

  private val q175Sql =
    """WITH c0 AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |    FROM documents) GROUP BY tok),
      |z AS (SELECT CAST(sum(CAST(floor(sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE))) * 1000000) AS BIGINT)) AS DOUBLE) / 1e6 AS z
      |      FROM c0)
      |SELECT tok, c, sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE))) AS weight,
      |       sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE))) / z AS prob
      |FROM c0 CROSS JOIN z ORDER BY tok""".stripMargin

  // ------------- dedup survivor remap / canonicalization map (q178)
  /** The step AFTER dedup that keeps downstream joins honest: every
    * doc maps to its cluster SURVIVOR (component-min doc_id; itself if
    * unclustered), producing the canonicalization table that dependent
    * datasets (chunks, annotations, links) join through — dropping
    * duplicates without repairing references corrupts every foreign
    * key pointing at a dropped copy. Reported as the full-map census
    * (count, remapped count, canonical count, id checksum): a STRONGER
    * oracle pin than q48's survivor count, because the checksum
    * certifies the entire label assignment, not just its cardinality.
    *
    * Scale shape: q29's banded pair generation + nearDupClusters
    * (driver union-find below the gate, pointer-jumping label-prop
    * above it) + one left join on doc_id; the census combines
    * map-side to one row. */
  private def q178(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, k = 32),
      bands = 4, rowsPerBand = 8, minEst = 0.9)
    val clusters = Dedup.nearDupClusters(pairs)
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("canonical_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("canonical_id") =!= col("doc_id"), 1L).otherwise(0L)).as("n_remapped"),
        countDistinct(col("canonical_id")).as("n_canonical"),
        sum(col("canonical_id")).as("canonical_id_sum"))
  }

  private val q178Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |p AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.9),
       |nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
       |${componentLabelCtes()}
       |, remap AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS canonical_id
       |            FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN canonical_id <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_remapped,
       |  CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_canonical,
       |  CAST(sum(canonical_id) AS BIGINT) AS canonical_id_sum
       |FROM remap""".stripMargin

  // ------------- positional phrase search (q179)
  /** Exact PHRASE retrieval — the positional-index query BM25 (q63)
    * can't answer: documents containing the exact token sequence
    * "slow hash batch", found by joining each term's POSITIONAL
    * postings on (doc_id, pos+offset). This is the scale formulation:
    * the plan touches only the three phrase terms' postings (filter
    * pushed to the token explode), never re-scans full text the way a
    * LIKE would, and a standing positional TextIndex slots in by
    * swapping the explode for the postings table — the join is
    * unchanged. Per-doc occurrence counts + corpus rollup, all
    * integers. */
  private def q179(s: SparkSession, d: String): DataFrame = {
    val phrase = Seq("slow", "hash", "batch")
    // persist with NO matching unpersist (the repo's lazy-plan pattern):
    // the r7 advice caught an unpersist placed right after building the
    // lazy `hits` plan — before any action — which silently turned the
    // cache into a no-op and recomputed the posexplode once per term.
    val toks = docs0(s, d).select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
      .where(col("tok").isin(phrase: _*)) // prune to phrase terms before the joins
      .persistT
    val hits = phrase.zipWithIndex.map { case (t, i) =>
      toks.where(col("tok") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }.reduce(_.join(_, Seq("doc_id", "start")))
    hits.groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .agg(count(lit(1)).as("n_docs_matched"),
        sum(col("n_occurrences")).as("n_occurrences"),
        sum(col("doc_id")).as("doc_id_sum"))
  }

  private val q179Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
      |p AS (SELECT doc_id, i AS start FROM t, unnest(range(1, len(tk) - 1)) AS u(i)
      |      WHERE tk[i] = 'slow' AND tk[i+1] = 'hash' AND tk[i+2] = 'batch'),
      |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs_matched,
      |       CAST(sum(n) AS BIGINT) AS n_occurrences,
      |       CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
      |FROM g""".stripMargin

  // ------------- sparse term-vector cosine similarity join (q180)
  /** The SPARSE member of the similarity-join family (dense cosine
    * q58, token-set Jaccard q56, gram containment q119): cosine over
    * raw term-frequency vectors, computed through the inverted index —
    * dot(a,b) = Σ_t tf_a(t)·tf_b(t) accumulates via a self-join on the
    * TERM, so only docs SHARING a term ever meet. TF weights stay
    * INTEGERS through the shuffle; the two norms are integer sums; the
    * one fp step is dot/(√na·√nb) at the end — sqrt is correctly
    * rounded, so every cosine is bit-portable. Pairs at cos ≥ 0.9 with
    * doc_a < doc_b, on a fixed 200-doc panel (see body comment). */
  private def q180(s: SparkSession, d: String): DataFrame = {
    // fixed id-prefix panel — q156's panel-exactness discipline. At
    // corpus scale the pair generation takes the q119 df-cap (a term
    // shared by everyone identifies nobody) or an LSH prefilter; the
    // dot-via-term-join and the integer weights are unchanged.
    val tf = docs0(s, d).where(col("doc_id") < 200)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persistT // norms pass + the pair join
    val norms = tf.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val a = tf.select(col("tok"), col("doc_id").as("doc_a"), col("tf").as("tfa"))
    val b = tf.select(col("tok"), col("doc_id").as("doc_b"), col("tf").as("tfb"))
    val dots = a.join(b, Seq("tok")).where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("tfa") * col("tfb")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("na")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("dot").cast(DoubleType) /
          (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType)))).as("cos"))
      .where(col("cos") >= 0.9)
      .sortedOut("doc_a", "doc_b")
  }

  private val q180Sql =
    """WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |           FROM documents WHERE doc_id < 200),
      |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
      |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY 1),
      |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |                CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
      |         FROM tf a JOIN tf b ON b.tok = a.tok AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
      |FROM dots JOIN norms na ON na.doc_id = dots.doc_a
      |          JOIN norms nb ON nb.doc_id = dots.doc_b
      |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.9
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------- HTML boilerplate extraction (q182)
  /** Tag-strip + line-density boilerplate removal over an HTML-wrapped
    * variant of `documents` — the first operator a CRAWL corpus runs
    * (the fixture is clean text, so the markup is synthesized
    * deterministically per doc: skeleton + nav + menu + the text as
    * the content paragraph + a per-doc-id variant line + footer).
    * The variant line rotates the three hard cases through the corpus:
    * doc_id%3==0 wraps the content in NESTED tags (must survive),
    * ==1 appends a LINK FARM whose text passes the length gate but
    * fails the density gate, ==2 injects a MALFORMED tag (attribute
    * quote swallows the `>`) that must still strip best-effort and
    * drop as too short. Census per doc: line counts by outcome
    * (kept / too-short / markup-dominated) + the extracted text's
    * length and md5 — the md5 pins the exact extraction, not just the
    * counts. See [[graft.text.Boilerplate]] for the keep rules (pure
    * integer gates) and QualitySpec for the edge-case pins.
    *
    * Scale shape: one pure per-document expression tree (split /
    * transform / filter / regexp_replace), zero shuffle before the
    * output sort — the raw-HTML column never leaves its scan task. */
  private def q182(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val variant = when(col("doc_id") % 3 === 0,
        concat(lit("<div><span>"), col("text"), lit("</span></div>")))
      .when(col("doc_id") % 3 === 1,
        concat(lit("<p class=\"rel\">"), substring(col("text"), 1, 30),
          lit("</p><a href=\"/p/1\">1</a><a href=\"/p/2\">2</a><a href=\"/p/3\">3</a>" +
            "<a href=\"/p/4\">4</a><a href=\"/p/5\">5</a><a href=\"/p/6\">6</a>" +
            "<a href=\"/p/7\">7</a><a href=\"/p/8\">8</a>")))
      .otherwise(lit("<div class=\"promo><b>subscribe now</b></div>"))
    val html = concat(
      lit("<html>\n<head><title>doc "), id, lit("</title></head>\n<body>\n"),
      lit("<div class=\"nav\"><a href=\"/\">home</a> | <a href=\"/c/"), col("source"),
      lit("\">"), col("source"), lit("</a> | <a href=\"/about\">about</a></div>\n"),
      lit("<ul class=\"menu\"><li><a href=\"/tags\">tags</a></li><li><a href=\"/feed\">feed</a></li></ul>\n"),
      lit("<p>"), col("text"), lit("</p>\n"),
      variant, lit("\n"),
      lit("<div class=\"footer\">(c) 2026 example | <a href=\"/tos\">terms</a> | <a href=\"/privacy\">privacy</a></div>\n</body>\n</html>"))
    docs0(s, d).select(col("doc_id"), html.as("html"))
      .select(col("doc_id"), graft.text.Boilerplate.census(col("html")).as("c"))
      .select(col("doc_id"),
        col("c.n_lines").as("n_lines"), col("c.n_kept").as("n_kept"),
        col("c.n_short").as("n_short"), col("c.n_lowdensity").as("n_lowdensity"),
        length(col("c.extracted")).cast(LongType).as("kept_chars"),
        md5(col("c.extracted").cast("binary")).as("extract_md5"))
      .sortedOutWide("doc_id")
  }

  private val q182Sql =
    """WITH h AS (SELECT doc_id,
      |    '<html>' || chr(10) || '<head><title>doc ' || CAST(doc_id AS VARCHAR)
      |    || '</title></head>' || chr(10) || '<body>' || chr(10)
      |    || '<div class="nav"><a href="/">home</a> | <a href="/c/' || source || '">'
      |    || source || '</a> | <a href="/about">about</a></div>' || chr(10)
      |    || '<ul class="menu"><li><a href="/tags">tags</a></li><li><a href="/feed">feed</a></li></ul>' || chr(10)
      |    || '<p>' || text || '</p>' || chr(10)
      |    || (CASE WHEN doc_id % 3 = 0 THEN '<div><span>' || text || '</span></div>'
      |             WHEN doc_id % 3 = 1 THEN '<p class="rel">' || substr(text, 1, 30)
      |               || '</p><a href="/p/1">1</a><a href="/p/2">2</a><a href="/p/3">3</a><a href="/p/4">4</a><a href="/p/5">5</a><a href="/p/6">6</a><a href="/p/7">7</a><a href="/p/8">8</a>'
      |             ELSE '<div class="promo><b>subscribe now</b></div>' END) || chr(10)
      |    || '<div class="footer">(c) 2026 example | <a href="/tos">terms</a> | <a href="/privacy">privacy</a></div>'
      |    || chr(10) || '</body>' || chr(10) || '</html>' AS html
      |  FROM documents),
      |st AS (SELECT doc_id, list_transform(str_split(html, chr(10)),
      |    l -> struct_pack(raw := len(l),
      |                     txt := len(trim(regexp_replace(l, '<[^>]*>', '', 'g'))),
      |                     s := trim(regexp_replace(l, '<[^>]*>', '', 'g')))) AS sts
      |  FROM h),
      |k AS (SELECT doc_id, sts,
      |    list_filter(sts, x -> x.txt >= 25 AND 2 * x.txt >= x.raw) AS kept
      |  FROM st)
      |SELECT doc_id,
      |  CAST(len(sts) AS BIGINT) AS n_lines,
      |  CAST(len(kept) AS BIGINT) AS n_kept,
      |  CAST(len(list_filter(sts, x -> x.txt < 25)) AS BIGINT) AS n_short,
      |  CAST(len(list_filter(sts, x -> x.txt >= 25 AND 2 * x.txt < x.raw)) AS BIGINT) AS n_lowdensity,
      |  CAST(len(array_to_string(list_transform(kept, x -> x.s), chr(10))) AS BIGINT) AS kept_chars,
      |  md5(array_to_string(list_transform(kept, x -> x.s), chr(10))) AS extract_md5
      |FROM k ORDER BY doc_id""".stripMargin

  // ------------- syndication communities by label propagation (q183)
  /** WHICH SOURCES FORM A RING: community detection over the
    * source-level syndication graph — nodes are sources, an edge's
    * weight is the number of cross-source near-dup candidate pairs
    * (q29's est ≥ 0.5), i.e. how much content the two feeds share.
    * One step past q170's pairwise direction matrix: the transitive
    * grouping ("these five feeds all mirror each other") that drives
    * crawl-budget and source-dedup decisions at the GROUP level.
    *
    * [[graft.ops.Graph.labelPropagation]] — deterministic synchronous
    * weighted LPA, 4 rounds, smallest-label tie-break — plus the exact
    * [[graft.ops.Graph.modularity]] of the resulting partition (the
    * quality-of-communities scalar, integer arithmetic until one final
    * division). The oracle unrolls the same 4 rounds (q117's unrolled
    * PageRank discipline) and recomputes Q from the same integer sums.
    *
    * Scale shape: pair generation IS q29 (banded, skew-capped); the
    * source graph is ≤|S|² rows, every LPA round one |E|-bounded
    * shuffle + a map-side-combining integer argmax — no window, no
    * sort, no fp. */
  private def q183(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, k = 32), bands = 4, rowsPerBand = 8, minEst = 0.5)
    val src = docs.select(col("doc_id"), col("source"))
    // localCheckpoint (not persist) the ≤|S|²-row edge list: it feeds
    // labelPropagation's 4 rounds AND modularity's joins, and a
    // persist only caches the DATA — every downstream plan still
    // carries (and re-analyzes) the whole minhash pair-pipeline
    // LINEAGE per round, which dominated the query (measured 10.5 s;
    // the checkpoint leaf cuts it to ~4 s — the Mmr.rerank lesson
    // applied at the operator boundary).
    val e = graft.ops.Lineage.cut(pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .where(col("sa") =!= col("sb"))
      .groupBy(col("sa").as("src"), col("sb").as("dst"))
      .agg(count(lit(1)).as("w")))
    val nodes = docs.select(col("source")).distinct()
    val labels = graft.ops.Graph.labelPropagation(e, nodes, iters = 4)
    val q = graft.ops.Graph.modularity(e, labels)
    labels.crossJoin(broadcast(q))
      .select(col("node").as("source"), col("community"),
        col("two_m"), col("modularity"))
      .sortedOut("source")
  }

  private val q183Sql = {
    def iter(p: String, c: String) =
      s"""nb$c AS (SELECT e.dst AS node, l.lbl, CAST(sum(e.w) AS BIGINT) AS s
         |  FROM e JOIN l$p l ON l.node = e.src GROUP BY 1, 2),
         |bs$c AS (SELECT node, lbl FROM (
         |    SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY s DESC, lbl) AS rn
         |    FROM nb$c) WHERE rn = 1),
         |l$c AS (SELECT n.node, coalesce(b.lbl, n.node) AS lbl
         |  FROM nodes n LEFT JOIN bs$c b ON b.node = n.node)""".stripMargin
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |pr AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.5),
       |e0 AS (SELECT da.source AS a, db.source AS b, CAST(count(*) AS BIGINT) AS w
       |  FROM pr JOIN documents da ON da.doc_id = pr.doc_a
       |          JOIN documents db ON db.doc_id = pr.doc_b
       |  WHERE da.source <> db.source GROUP BY 1, 2),
       |e AS (SELECT a AS src, b AS dst, CAST(sum(w) AS BIGINT) AS w
       |  FROM (SELECT a, b, w FROM e0 UNION ALL SELECT b AS a, a AS b, w FROM e0) u
       |  GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT source AS node FROM documents),
       |l0 AS (SELECT node, node AS lbl FROM nodes),
       |${iter("0", "1")},
       |${iter("1", "2")},
       |${iter("2", "3")},
       |${iter("3", "4")},
       |tm AS (SELECT CAST(sum(w) AS BIGINT) AS two_m FROM e),
       |j AS (SELECT e.w, la.lbl AS ca, lb.lbl AS cb
       |  FROM e JOIN l4 la ON la.node = e.src JOIN l4 lb ON lb.node = e.dst),
       |tot AS (SELECT ca AS c, CAST(sum(w) AS BIGINT) AS tot_c FROM j GROUP BY 1),
       |inc AS (SELECT ca AS c, CAST(sum(w) AS BIGINT) AS in_c FROM j WHERE ca = cb GROUP BY 1),
       |num AS (SELECT sum(coalesce(inc.in_c, 0) * tm.two_m - tot.tot_c * tot.tot_c) AS numer
       |  FROM tot LEFT JOIN inc ON inc.c = tot.c CROSS JOIN tm)
       |SELECT l4.node AS source, l4.lbl AS community, tm.two_m,
       |  CAST(num.numer AS DOUBLE)
       |    / (CAST(tm.two_m AS DOUBLE) * CAST(tm.two_m AS DOUBLE)) AS modularity
       |FROM l4 CROSS JOIN tm CROSS JOIN num ORDER BY source""".stripMargin
  }

  // ------------- URL canonicalization + per-domain census (q185)
  /** The crawl-pipeline step BEFORE URL-keyed dedup or per-domain
    * budgeting can work: collapse tracking-junk/fragment/case/www
    * variants of the same page to one canonical key
    * ([[graft.text.UrlOps.canonicalize]] — RE2-portable regex rules,
    * so both engines can run them identically). The fixture has no URL
    * column, so URLs are SYNTHESIZED deterministically (the q182
    * discipline) with doc_id-rotated variants: %4 plants an uppercase
    * `WWW.` host, %3 rotates {all-utm query | mixed query + fragment |
    * bare}; 50 docs share each base page so canonicalization actually
    * collapses. Census per domain: url count, canonical count, max
    * variants per canonical page.
    *
    * The ORACLE does not re-run the regexes — it states what canonical
    * form the rules MUST produce by direct construction, so a regex
    * bug on either side breaks the match (stronger than a mirrored
    * implementation). Scale shape: pure per-row regexp work in the
    * scan stage; one (domain, canonical) aggregate, map-side combined,
    * then a |domains|-row rollup. */
  private def q185(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val raw = concat(
      when(id % 4 === 0, lit("https://WWW.")).otherwise(lit("https://")),
      col("source"), lit(".example.com/"), col("lang"), lit("/post/"),
      (id % 50).cast("string"),
      when(id % 3 === 0, lit("?utm_source=feed&utm_medium=rss"))
        .when(id % 3 === 1, lit("?page=2&utm_campaign=x#top"))
        .otherwise(lit("")))
    val canon = docs0(s, d)
      .select(graft.text.UrlOps.canonicalize(raw).as("canonical"))
      .select(col("canonical"),
        graft.text.UrlOps.domainOf(col("canonical")).as("domain"))
    canon.groupBy("domain", "canonical").agg(count(lit(1)).as("n"))
      .groupBy("domain")
      .agg(sum(col("n")).as("n_urls"), count(lit(1)).as("n_canonical"),
        max(col("n")).as("max_variants"))
      .sortedOut("domain")
  }

  private val q185Sql =
    """WITH c AS (SELECT source || '.example.com' AS domain,
      |    'https://' || source || '.example.com/' || lang || '/post/'
      |      || CAST(doc_id % 50 AS VARCHAR)
      |      || CASE WHEN doc_id % 3 = 1 THEN '?page=2' ELSE '' END AS canonical
      |  FROM documents),
      |per AS (SELECT domain, canonical, CAST(count(*) AS BIGINT) AS n
      |  FROM c GROUP BY 1, 2)
      |SELECT domain, CAST(sum(n) AS BIGINT) AS n_urls,
      |  CAST(count(*) AS BIGINT) AS n_canonical, max(n) AS max_variants
      |FROM per GROUP BY domain ORDER BY domain""".stripMargin

  // ------------- WARC ingestion census (q187)
  /** Parse the crawl-archive container itself: each document's fetch is
    * materialized as deterministic WARC bytes (warcinfo + request +
    * response triple, [[graft.sources.Warc.warcForDoc]] — the q184
    * bytes-first planting discipline, since the fixture has no WARC
    * column) and the census reports what the PARSER recovered: record
    * count, response count, target URI, HTTP status, salvaged body
    * length/md5 and the truncated/gzipped observations. Two planted
    * hard cases rotate through the corpus: doc_id%13==5 chops the last
    * 10 bytes of the stream (interrupted transfer — the parser must
    * salvage `len(text)-6` body bytes and flag truncated, NOT throw),
    * and doc_id%7==3 (when not truncated) writes the real `.warc.gz`
    * layout (one gzip member per record) the parser must inflate.
    * The oracle never parses bytes — it states what the parse MUST
    * recover directly from the source columns, so a kernel bug on
    * either side breaks the match (the q185 direct-construction rule).
    *
    * Scale shape: synthesize+parse is one narrow map in the scan stage
    * (at 100 TB the same kernel runs per `.warc.gz` FILE via
    * [[graft.sources.Warc.scan]] — the Common-Crawl unit of
    * parallelism); only the |docs|-row census reaches the output sort,
    * and the body bytes are hashed BEFORE it. */
  private def q187(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val parsed = docs0(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .as[(Long, String, String, String)]
      .map { case (id, src, lang, text) =>
        val trunc = id % 13 == 5
        val gz = !trunc && id % 7 == 3
        val bytes = graft.sources.Warc.warcForDoc(id, src, lang, text,
          truncateTail = if (trunc) 10 else 0, gzipPerRecord = gz)
        val recs = graft.sources.Warc.parse(bytes)
        val resp = recs.find(_.warcType == "response")
        val (status, body) = resp.map(r => graft.sources.Warc.httpBody(r.payload))
          .getOrElse((0L, Array.emptyByteArray))
        (id, recs.length.toLong, recs.count(_.warcType == "response").toLong,
          resp.map(_.targetUri).getOrElse(""), status, body.length.toLong,
          body, recs.exists(_.truncated), graft.sources.Warc.isGzip(bytes))
      }
      .toDF("doc_id", "n_records", "n_response", "target_uri", "http_status",
        "body_len", "body", "truncated", "gzipped")
    parsed
      .select(col("doc_id"), col("n_records"), col("n_response"),
        col("target_uri"), col("http_status"), col("body_len"),
        md5(col("body")).as("body_md5"), col("truncated"), col("gzipped"))
      .sortedOutWide("doc_id")
  }

  private val q187Sql =
    """SELECT doc_id,
      | CAST(3 AS BIGINT) AS n_records, CAST(1 AS BIGINT) AS n_response,
      | 'https://' || source || '.example.com/' || lang || '/post/'
      |   || CAST(doc_id % 50 AS VARCHAR) AS target_uri,
      | CAST(200 AS BIGINT) AS http_status,
      | CAST(CASE WHEN doc_id % 13 = 5 THEN length(text) - 6
      |           ELSE length(text) END AS BIGINT) AS body_len,
      | md5(CASE WHEN doc_id % 13 = 5 THEN substr(text, 1, length(text) - 6)
      |          ELSE text END) AS body_md5,
      | doc_id % 13 = 5 AS truncated,
      | doc_id % 7 = 3 AND doc_id % 13 <> 5 AS gzipped
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------- Unicode NFC normalization census (q188)
  /** The hygiene pass BEFORE any hash-keyed operator: composed and
    * decomposed forms of the same visible text must collapse or exact
    * dedup (q23), shingles (q29) and vocab ids (q79) silently treat
    * them as different documents. [[graft.text.Nfc]] (native JDK
    * Normalizer expression, real doGenCode) normalizes; the census
    * reports changed-flag, char counts before/after, combining-mark
    * count and the normalized text's md5. The fixture text is pure
    * ASCII, so non-NFC input is PLANTED (q182 discipline), rotating
    * the canonical cases: %4==0 appends combining-acute 'e'+U+0301
    * (composes to é, one char shorter), %4==1 appends the Angstrom
    * SIGN U+212B (composes to Å, same length — a singleton mapping,
    * not a mark), %4==2 appends precomposed é (already NFC — must NOT
    * change), %4==3 stays bare ASCII.
    *
    * The oracle runs DuckDB's `nfc_normalize` — an INDEPENDENT UAX#15
    * implementation (utf8proc) — on identically-constructed input:
    * both engines must produce byte-identical normal forms for the
    * hash to match, a stronger pin than any mirrored formula; NfcSpec
    * adds direct-construction pins (incl. Hangul jamo composition).
    *
    * Scale shape: pure narrow per-row work; the ASCII/already-NFC
    * fast path (isNormalized quick-check) never allocates. */
  private def q188(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("doc_id") % 4 === 0, concat(col("text"), lit(" Cafe\u0301")))
      .when(col("doc_id") % 4 === 1, concat(col("text"), lit(" \u212B")))
      .when(col("doc_id") % 4 === 2, concat(col("text"), lit(" \u00E9")))
      .otherwise(col("text"))
    docs0(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"), col("raw"), graft.text.Nfc.nfc(col("raw")).as("nf"))
      .select(col("doc_id"),
        (col("nf") =!= col("raw")).as("changed"),
        length(col("raw")).cast(LongType).as("n_chars_raw"),
        length(col("nf")).cast(LongType).as("n_chars_nfc"),
        (length(col("raw")) -
          length(regexp_replace(col("raw"), "[\\x{0300}-\\x{036F}]", "")))
          .cast(LongType).as("n_marks_raw"),
        md5(col("nf").cast("binary")).as("nfc_md5"))
      .sortedOutWide("doc_id")
  }

  private val q188Sql =
    """WITH r AS (SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN text || ' Cafe' || chr(769)
      |         WHEN doc_id % 4 = 1 THEN text || ' ' || chr(8491)
      |         WHEN doc_id % 4 = 2 THEN text || ' ' || chr(233)
      |         ELSE text END AS raw
      |  FROM documents),
      |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nf FROM r)
      |SELECT doc_id, nf <> raw AS changed,
      |  CAST(length(raw) AS BIGINT) AS n_chars_raw,
      |  CAST(length(nf) AS BIGINT) AS n_chars_nfc,
      |  CAST(length(raw) - length(regexp_replace(raw, '[\x{0300}-\x{036F}]', '', 'g')) AS BIGINT) AS n_marks_raw,
      |  md5(nf) AS nfc_md5
      |FROM n ORDER BY doc_id""".stripMargin

  // ------------- WARC landing-directory census (q190)
  /** [[graft.sources.Warc.scan]] end-to-end at the FILE grain — the
    * Common-Crawl landing shape: a directory of multi-record
    * `.warc.gz` files, one binaryFile task per file, records
    * flat-mapped by the content-length kernel. The landing dir is
    * PLANTED from the documents fixture (one gzip-per-record file per
    * (source, lang), docs in id order — the q187 bytes-first
    * discipline at directory scale; the local tmp write is fixture
    * scaffolding, the operator under test is the scan). The census
    * aggregates per file: record/response counts and the exact
    * response-payload byte total, which the oracle reconstructs from
    * the documents table alone — every payload byte is
    * `78 + digits(len) + len` of the fixture HTTP head, so a parser
    * or builder drift of ONE byte anywhere fails the match.
    *
    * Scale shape: the scan is one task per file and nothing but the
    * (path-grain) census leaves the scan stage. The PLANTING pass is
    * a DRIVER-side collected loop (ADVICE r9: the earlier
    * executor-side `mapGroups` write into a driver tmp dir was
    * correct only in local mode — on a cluster the scan would see
    * missing files), and the tmp landing dir is deleted once the
    * census has materialized, so repeated runs leak nothing; a real
    * deployment points [[graft.sources.Warc.scan]] at a shared-FS
    * landing dir and skips planting entirely. */
  private def q190(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-landing")
    try {
      docs0(s, d).select(col("doc_id"), col("source"), col("lang"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
        .groupBy { case (_, src, lang, _) => (src, lang) }
        .foreach { case ((src, lang), docs) =>
          val bytes = docs.sortBy(_._1).map { case (id, _, _, text) =>
            graft.sources.Warc.warcForDoc(id, src, lang, text, gzipPerRecord = true)
          }.reduce(_ ++ _)
          java.nio.file.Files.write(dir.resolve(s"$src-$lang.warc.gz"), bytes)
        }
      val census = graft.sources.Warc.scan(s, dir.toString + "/*.warc.gz")
        .select(
          regexp_extract(col("path"), "([a-z0-9]+)-([a-z]+)\\.warc\\.gz$", 1).as("source"),
          regexp_extract(col("path"), "([a-z0-9]+)-([a-z]+)\\.warc\\.gz$", 2).as("lang"),
          col("warc_type"), col("payload_length"), col("truncated"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("warc_type") === "response", 1L).otherwise(0L)).as("n_response"),
          sum(when(col("warc_type") === "request", 1L).otherwise(0L)).as("n_request"),
          sum(when(col("warc_type") === "response", col("payload_length"))
            .otherwise(0L)).as("resp_payload_bytes"),
          sum(when(col("truncated"), 1L).otherwise(0L)).as("n_truncated"))
        .sortedOut("source", "lang")
      // materialize BEFORE the finally-block removes the landing dir;
      // the returned frame is the (tiny, per-file-grain) census itself
      val rows = java.util.Arrays.asList(census.collect(): _*)
      s.createDataFrame(rows, census.schema)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      val paths = try walk.iterator().asScala.toVector finally walk.close()
      paths.sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private val q190Sql =
    """SELECT source, lang,
      | CAST(3 * count(*) AS BIGINT) AS n_records,
      | CAST(count(*) AS BIGINT) AS n_response,
      | CAST(count(*) AS BIGINT) AS n_request,
      | CAST(sum(78 + length(CAST(length(text) AS VARCHAR)) + length(text)) AS BIGINT)
      |   AS resp_payload_bytes,
      | CAST(0 AS BIGINT) AS n_truncated
      |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin

  // ------------- robots.txt politeness census (q191)
  /** The crawl-POLITENESS gate before [[graft.sources.Warc]] ingestion
    * ever fetches a byte — and the takedown-hygiene audit after: which
    * of the corpus URLs would each host's robots.txt allow the crawler
    * to hold? [[graft.sources.Robots]] implements the RFC 9309 kernel
    * (agent-group selection, longest-match precedence, Allow
    * tie-break, `*`/`$` patterns); the fixture plants a deterministic
    * robots.txt per source that exercises ALL of it: sources i%4<2
    * carry a graftbot-specific group (so the `*` group must NOT
    * apply), i%2==0 adds a longest-match Allow carve-out whose PREFIX
    * nature also admits posts 10-19, and the fallback `*` group uses a
    * wildcard-anchored pattern. The oracle never parses robots.txt —
    * it states the decision in closed form over (source index, lang,
    * post id), so any kernel deviation (group choice, tie-break,
    * anchor) breaks the match (the q187 discipline).
    *
    * Scale shape: one narrow map in the scan stage (per-row parse of a
    * host-sized robots.txt; a frontier at 100 TB parses once per HOST
    * and broadcasts the rule sets — same kernel, different caching);
    * only the per-source census reaches the sort. */
  private def q191(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs0(s, d).select(col("doc_id"), col("source"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, src, lang) =>
        val i = src.stripPrefix("src").toInt
        val robots =
          (if (i % 4 < 2)
            "User-agent: graftbot\nDisallow: /zh/\n" +
              (if (i % 2 == 0) "Allow: /zh/post/1\n" else "")
          else "") +
            "User-agent: *\nDisallow: /*/post/49$\nDisallow: /de/\n"
        val path = s"/$lang/post/${id % 50}"
        (src, if (graft.sources.Robots.isAllowed(robots, "graftbot", path)) 1L else 0L)
      }
      .toDF("source", "allowed")
      .groupBy("source")
      .agg(count(lit(1)).as("n_urls"),
        sum(col("allowed")).as("n_allowed"),
        (count(lit(1)) - sum(col("allowed"))).as("n_blocked"))
      .sortedOut("source")
  }

  private val q191Sql =
    """WITH u AS (SELECT source,
      |    CAST(substr(source, 4) AS INT) AS i, lang, doc_id % 50 AS post
      |  FROM documents),
      |dec AS (SELECT source,
      |    CASE WHEN i % 4 < 2
      |         THEN (lang = 'zh' AND NOT (i % 2 = 0 AND (post = 1 OR post BETWEEN 10 AND 19)))
      |         ELSE (lang = 'de' OR post = 49) END AS blocked
      |  FROM u)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
      |  CAST(sum(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_allowed,
      |  CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
      |FROM dec GROUP BY source ORDER BY source""".stripMargin

  // ------------- script-mix / homoglyph census (q192)
  /** The script-level hygiene pass beside NFC (q188): real crawl text
    * mixes writing systems both legitimately (quoted names) and
    * maliciously (Cyrillic homoglyphs inside Latin words — the
    * classic "p\u0430yp\u0430l" spoof that survives NFC unchanged and
    * poisons exact dedup, URL keys and vocabularies). Counts
    * codepoints per EXPLICIT range class (Latin letters, Cyrillic
    * U+0400-U+04FF, Han U+4E00-U+9FFF, Arabic U+0600-U+06FF — literal
    * ranges, not \p{Script}, so both engines' regexes mean the same
    * thing regardless of their Unicode versions), flags doc-level
    * mixing, and counts WORD-level spoofs (a whitespace token holding
    * both Latin and Cyrillic). Planted forms rotate through the ASCII
    * fixture via \u escapes (q188 source-hygiene rule); the oracle
    * runs the IDENTICAL RE2-portable regexes on identically-
    * constructed input.
    *
    * Scale shape: pure narrow per-row regex work in the scan stage. */
  private def q192(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("doc_id") % 5 === 1,
        concat(col("text"), lit(" \u041C\u043E\u0441\u043A\u0432\u0430")))
      .when(col("doc_id") % 5 === 2,
        concat(col("text"), lit(" \u5317\u4EAC\u5927\u5B66")))
      .when(col("doc_id") % 5 === 3,
        concat(col("text"), lit(" \u0645\u0631\u062D\u0628\u0627")))
      .when(col("doc_id") % 5 === 4,
        concat(col("text"), lit(" p\u0430yp\u0430l")))
      .otherwise(col("text"))
    def nOf(c: Column, cls: String): Column =
      (length(c) - length(regexp_replace(c, cls, ""))).cast(LongType)
    val spoofRe =
      "[^ ]*([A-Za-z][^ ]*[\\x{0400}-\\x{04FF}]|[\\x{0400}-\\x{04FF}][^ ]*[A-Za-z])[^ ]*"
    docs0(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        nOf(col("raw"), "[A-Za-z]").as("n_latin"),
        nOf(col("raw"), "[\\x{0400}-\\x{04FF}]").as("n_cyrillic"),
        nOf(col("raw"), "[\\x{4E00}-\\x{9FFF}]").as("n_han"),
        nOf(col("raw"), "[\\x{0600}-\\x{06FF}]").as("n_arabic"),
        size(regexp_extract_all(col("raw"), lit(spoofRe), lit(0)))
          .cast(LongType).as("n_spoof_words"))
      .withColumn("doc_mixed",
        col("n_latin") > 0 &&
          (col("n_cyrillic") + col("n_han") + col("n_arabic")) > 0)
      .sortedOutWide("doc_id")
  }

  private val q192Sql = {
    val spoofRe =
      "[^ ]*([A-Za-z][^ ]*[\\x{0400}-\\x{04FF}]|[\\x{0400}-\\x{04FF}][^ ]*[A-Za-z])[^ ]*"
    s"""WITH r AS (SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 1 THEN text || ' ' || chr(1052)||chr(1086)||chr(1089)||chr(1082)||chr(1074)||chr(1072)
       |         WHEN doc_id % 5 = 2 THEN text || ' ' || chr(21271)||chr(20140)||chr(22823)||chr(23398)
       |         WHEN doc_id % 5 = 3 THEN text || ' ' || chr(1605)||chr(1585)||chr(1581)||chr(1576)||chr(1575)
       |         WHEN doc_id % 5 = 4 THEN text || ' p'||chr(1072)||'yp'||chr(1072)||'l'
       |         ELSE text END AS raw
       |  FROM documents),
       |c AS (SELECT doc_id,
       |  CAST(length(raw) - length(regexp_replace(raw, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
       |  CAST(length(raw) - length(regexp_replace(raw, '[\\x{0400}-\\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
       |  CAST(length(raw) - length(regexp_replace(raw, '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS BIGINT) AS n_han,
       |  CAST(length(raw) - length(regexp_replace(raw, '[\\x{0600}-\\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
       |  CAST(len(regexp_extract_all(raw, '$spoofRe', 0)) AS BIGINT) AS n_spoof_words
       |  FROM r)
       |SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic, n_spoof_words,
       |  n_latin > 0 AND (n_cyrillic + n_han + n_arabic) > 0 AS doc_mixed
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // --------------------- exact Jaccard join by prefix filtering (q196)
  /** EXACT set-similarity self-join via the PPJoin prefix-filter
    * principle (Xiao et al. 2008) — the exact counterpart of the
    * MinHash-LSH approximation (q29): for Jaccard(A,B) >= t, A and B
    * MUST share a token among the first |X| - ceil(t|X|) + 1 tokens of
    * each when every set is ordered by one GLOBAL token order (rarest
    * first, so prefixes carry the most selective tokens). Candidates
    * come from a self-join of prefix tokens only, pre-pruned by the
    * LENGTH filter (Jaccard >= t forces 9·|A| <= 10·|B| and vice
    * versa — a one-comparison kill before any verification); exact
    * intersection/union counts verify. The threshold t = 9/10 is kept
    * RATIONAL end-to-end: prefix length uses integer ceil
    * (n - (9n+9) div 10 + 1) and the filter is 10·inter >= 9·union —
    * no fp anywhere, which is what lets the oracle assert EXHAUSTIVE
    * completeness: DuckDB computes every token-sharing pair
    * brute-force through the inverted index, so one pair missed by
    * the prefix or length filter (an incompleteness bug) fails the
    * hash match — as does one slip in the expansion algebra below.
    *
    * The decisive scale move: EXACT-DUPLICATE COLLAPSE FIRST. A
    * dup-saturated corpus (this fixture, most crawls) has far fewer
    * DISTINCT token sets than documents; identical sets join at
    * Jaccard 1 by definition, so the quadratic pair mass inside and
    * between those families must never be enumerated. Documents
    * group by a set signature (md5 of the sorted distinct tokens),
    * PPJoin runs on one representative per group, and the 1-row
    * summary EXPANDS arithmetically from per-group (count, id-sum,
    * id-square-sum): a group of m copies contributes C(m,2) Jaccard-1
    * pairs; a qualifying representative pair (A,B) contributes
    * mA·mB pairs; the symmetric id checksums Σ(a+b) and Σ(a·b)
    * expand as (m−1)·s and (s²−q)/2 within a group, and mB·sA+mA·sB
    * and sA·sB across — which is WHY the checksums are symmetric
    * functions, not the doc_a<doc_b-keyed form (that one cannot be
    * expanded without enumerating). Measured at sf0.1: 35 s
    * enumerated → the collapsed form below; the oracle still
    * enumerates every pair brute-force, so the algebra is verified,
    * not trusted.
    *
    * Scale shape: at t = 9/10 the prefix is ~n/10 RAREST tokens
    * (rarest-first ordering keeps flooded tokens out), and the length
    * filter kills cross-size candidates before the verification
    * joins, which are linear in surviving candidate token lists. The
    * global token ranking is a vocabulary-bounded sort (the Bpe/Vocab
    * precedent). A loose threshold (say 3/5) on a shared-vocabulary
    * corpus is the WRONG tool by construction: its prefixes cover
    * ~2n/5 tokens and its result set is quadratic — measured 102 s at
    * sf0.1 before this was retuned; near-dup dedup is the 0.9 regime. */
  private def q196(s: SparkSession, d: String): DataFrame = {
    val allToks = docs0(s, d)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .where(length(col("tok")) > 0).distinct().persistT
    // exact-dup collapse: group docs by set signature, keep min-id rep
    val groups = allToks.groupBy("doc_id")
      .agg(md5(concat_ws("\u0001", sort_array(collect_set(col("tok"))))).as("sig"))
      .groupBy("sig")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("m"),
        sum(col("doc_id")).cast(DecimalType(38, 0)).as("ids"),
        sum(col("doc_id") * col("doc_id")).cast(DecimalType(38, 0)).as("idsq"))
      .persistT
    val reps = groups.select(col("rep").as("doc_id"), col("m"), col("ids"), col("idsq"))
    val toks = allToks.join(reps.select("doc_id"), Seq("doc_id"), "left_semi").persistT
    // global order: rarest first (df over REPRESENTATIVES), ties by
    // token. The rank frame is vocabulary-sized — which Heaps' law
    // (q159) says GROWS with the corpus — so it gets the distributed
    // globalRowNumber formulation, not a single-partition
    // row_number().over(Window.orderBy(...)) window.
    val ranked = graft.ops.RelationalOps.globalRowNumber(
        toks.groupBy("tok").agg(count(lit(1)).as("df")),
        Seq(col("df").asc, col("tok").asc), outCol = "rk")
      .select(col("tok"), col("rk"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val withRank = toks.join(ranked, Seq("tok")).join(sizes, Seq("doc_id"))
    // prefix length n - ceil(9n/10) + 1, integer arithmetic only
    val prefix = withRank
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("rk").asc)))
      .where(col("pos") <= col("n") - ((col("n") * 9 + 9) / 10).cast("long") + 1)
      .select(col("doc_id"), col("tok"), col("n"))
    val cands = prefix.select(col("tok"), col("doc_id").as("doc_a"), col("n").as("na"))
      .join(prefix.select(col("tok"), col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("tok"))
      .where(col("doc_a") < col("doc_b") &&
        // length filter: Jaccard >= 9/10 is impossible across sizes
        // differing by more than 10/9 — kill before verification
        col("na") * 9 <= col("nb") * 10 && col("nb") * 9 <= col("na") * 10)
      .select("doc_a", "doc_b").distinct()
    val inter = cands
      .join(toks.select(col("doc_id").as("doc_a"), col("tok")), Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    // expansion algebra over document-level pairs, DECIMAL(38,0) so no
    // magnitude ever overflows; never enumerate the quadratic pair set
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val crossPairs = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"))
      .where(col("n_inter") * 10 >= col("n_union") * 9)
      .join(reps.select(col("doc_id").as("doc_a"), col("m").as("ma"),
        col("ids").as("sa")), Seq("doc_a"))
      .join(reps.select(col("doc_id").as("doc_b"), col("m").as("mb"),
        col("ids").as("sb")), Seq("doc_b"))
      .agg(
        coalesce(sum(dec(col("ma")) * dec(col("mb"))), dec(lit(0))).as("np"),
        coalesce(sum(dec(col("ma")) * dec(col("mb")) * dec(col("n_inter"))), dec(lit(0))).as("si"),
        coalesce(sum(dec(col("ma")) * dec(col("mb")) * dec(col("n_union"))), dec(lit(0))).as("su"),
        coalesce(sum(dec(col("mb")) * col("sa") + dec(col("ma")) * col("sb")), dec(lit(0))).as("sab"),
        coalesce(sum(col("sa") * col("sb")), dec(lit(0))).as("pab"))
    val withinPairs = groups
      .join(sizes.select(col("doc_id").as("rep"), col("n")), Seq("rep"))
      .where(col("m") >= 2)
      .agg(
        coalesce(sum(dec(col("m")) * dec(col("m") - 1) / 2), dec(lit(0))).as("wnp"),
        coalesce(sum(dec(col("m")) * dec(col("m") - 1) / 2 * dec(col("n"))), dec(lit(0))).as("wsi"),
        coalesce(sum(dec(col("m")) * dec(col("m") - 1) / 2 * dec(col("n"))), dec(lit(0))).as("wsu"),
        coalesce(sum(dec(col("m") - 1) * col("ids")), dec(lit(0))).as("wsab"),
        coalesce(sum((col("ids") * col("ids") - col("idsq")) / 2), dec(lit(0))).as("wpab"))
    crossPairs.crossJoin(broadcast(withinPairs))
      .select(
        (col("np") + col("wnp")).cast(LongType).as("n_pairs"),
        (col("si") + col("wsi")).cast(LongType).as("sum_inter"),
        (col("su") + col("wsu")).cast(LongType).as("sum_union"),
        (col("sab") + col("wsab")).cast(LongType).as("sum_ab"),
        (col("pab") + col("wpab")).cast(LongType).as("prod_ab"))
  }

  private val q196Sql =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, tok
      |  FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |        FROM documents)
      |  WHERE length(tok) > 0),
      |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(count(*) AS BIGINT) AS n_inter
      |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(n_inter) AS BIGINT) AS sum_inter,
      |  CAST(sum(n_union) AS BIGINT) AS sum_union,
      |  CAST(sum(doc_a + doc_b) AS BIGINT) AS sum_ab,
      |  CAST(sum(doc_a * doc_b) AS BIGINT) AS prod_ab
      |FROM (SELECT doc_a, doc_b, n_inter, sa.n + sb.n - n_inter AS n_union
      |  FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
      |             JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE n_inter * 10 >= (sa.n + sb.n - n_inter) * 9)""".stripMargin

  // ------- edit-distance-1 vocabulary join via deletion neighborhoods (q201)
  /** Typo-tolerant vocabulary consolidation — the COMPLETE twin of
    * q153's heuristic first-token blocking: for edit distance ≤ 1,
    * the FastSS deletion-neighborhood principle is a THEOREM, not a
    * recall bet. Two strings are within Levenshtein 1 iff they share
    * a key in {t} ∪ delete1(t): a substitution pair shares the
    * deletion at the differing position, an insertion/deletion pair
    * shares the shorter string itself. Candidates therefore come from
    * ONE equi-join on generated variant keys (|t|+1 narrow rows per
    * vocab term — no quadratic stage anywhere), then exact
    * `levenshtein` verifies away false candidates (strings at
    * distance 2 can share a deletion variant — "abX" and "abY" both
    * delete to "ab" from position 3, which is a TRUE substitution
    * pair, but "aXc"/"aYd" share nothing; the verify step is what
    * makes over-generation harmless, never completeness). Both engines build
    * the identical neighborhoods and run their own exact Levenshtein,
    * so the PAIR SET matches, not an estimate; pairs split into
    * substitutions (equal length) vs indels. Tokens are length-capped
    * [4, 20] — the q119-style guard that also bounds neighborhood
    * fan-out.
    *
    * Scale shape: vocabulary-bounded, not corpus-bounded (the
    * distinct-token frame is the input); variant generation is a
    * narrow per-row transform; the self-join keys are (len-1)-grams
    * whose frequency the length floor keeps tame — the same
    * skew-surface as LSH band buckets, with the same cap discipline
    * available if a real corpus needs it. */
  private def q201(s: SparkSession, d: String): DataFrame = {
    val vocab = docs0(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .where(length(col("tok")).between(4, 20)).distinct().persistT
    // keys: the token itself (distance-0 / indel anchor) + all
    // single-deletion variants, tagged with nothing but the string
    val variants = vocab.select(col("tok"),
      explode(concat(array(col("tok")),
        transform(sequence(lit(1), length(col("tok"))), i =>
          concat(col("tok").substr(lit(1), i - 1),
            col("tok").substr(i + 1, lit(2147483647)))))).as("key"))
      .distinct()
    val cands = variants.select(col("key"), col("tok").as("tok_a"))
      .join(variants.select(col("key"), col("tok").as("tok_b")), Seq("key"))
      .where(col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b").distinct()
    val pairs = cands
      .where(levenshtein(col("tok_a"), col("tok_b")) <= 1)
    val out = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(length(col("tok_a")) === length(col("tok_b")), 1L)
        .otherwise(0L)).as("n_subst"),
      sum(when(length(col("tok_a")) =!= length(col("tok_b")), 1L)
        .otherwise(0L)).as("n_indel"),
      sum(length(col("tok_a")) + length(col("tok_b"))).cast(LongType).as("len_sum"))
    val nv = vocab.agg(count(lit(1)).as("n_vocab"))
    out.crossJoin(broadcast(nv))
      .select(col("n_vocab"), col("n_pairs"), col("n_subst"),
        col("n_indel"), col("len_sum"))
  }

  private val q201Sql =
    """WITH vocab AS (
      |  SELECT DISTINCT tok
      |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |        FROM documents)
      |  WHERE length(tok) BETWEEN 4 AND 20),
      |variants AS (
      |  SELECT DISTINCT tok, key FROM (
      |    SELECT tok, tok AS key FROM vocab
      |    UNION ALL
      |    SELECT tok, substr(tok, 1, i - 1) || substr(tok, i + 1) AS key
      |    FROM vocab, unnest(range(1, length(tok) + 1)) AS t(i))),
      |cands AS (
      |  SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
      |  FROM variants a JOIN variants b USING (key)
      |  WHERE a.tok < b.tok),
      |pairs AS (SELECT * FROM cands WHERE levenshtein(tok_a, tok_b) <= 1)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM vocab) AS n_vocab,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CASE WHEN length(tok_a) = length(tok_b) THEN 1 ELSE 0 END) AS BIGINT) AS n_subst,
      |  CAST(sum(CASE WHEN length(tok_a) <> length(tok_b) THEN 1 ELSE 0 END) AS BIGINT) AS n_indel,
      |  CAST(sum(length(tok_a) + length(tok_b)) AS BIGINT) AS len_sum
      |FROM pairs""".stripMargin

  // ------- naive-split near-dup leakage audit (q245)
  /** The MONITORING twin of the leak-free splitters: q106/q133 build
    * splits that cannot leak BY CONSTRUCTION; this query AUDITS the
    * split everyone actually ships first — a per-document hash split
    * (md5-60 of "split:"+doc_id, 80/10/10) — and prices its leakage:
    * near-dup candidate pairs (est ≥ 0.7, q29's banded machinery)
    * whose endpoints landed in different splits. The train/test and
    * train/val rows are the headline: every such pair is an eval
    * document whose near-duplicate the model trained on. Reported per
    * unordered split pair: pairs, distinct docs involved, their token
    * mass.
    *
    * Scale shape: one banded candidate generation + two shuffle joins
    * to attach split labels (doc_id-keyed, co-partitioned with the
    * pair frame), then doc-grain distinct + two tiny rollups. */
  private def q245(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val split = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"),
        pmod(Hashing.h60(concat(lit("split:"), col("doc_id").cast(StringType))),
          lit(100L)).as("b"))
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
      .drop("b").persistT
    val lab = Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs, k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7)
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa"),
        col("n_tok").as("ta")), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb"),
        col("n_tok").as("tb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"),
        col("doc_a"), col("doc_b"), col("ta"), col("tb"))
      .persistT
    val involved = lab.select(col("split_a"), col("split_b"),
        col("doc_a").as("doc_id"), col("ta").as("n_tok"))
      .unionByName(lab.select(col("split_a"), col("split_b"),
        col("doc_b").as("doc_id"), col("tb").as("n_tok")))
      .distinct()
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    lab.groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
      .join(involved, Seq("split_a", "split_b"))
      .sortedOut("split_a", "split_b")
  }

  private lazy val q245Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |sl AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok,
       |    CASE WHEN ${Hashing.duckH60("concat('split:', CAST(doc_id AS VARCHAR))")} % 100 < 80 THEN 'train'
       |         WHEN ${Hashing.duckH60("concat('split:', CAST(doc_id AS VARCHAR))")} % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |lab AS (SELECT least(a.split, b.split) AS split_a,
       |    greatest(a.split, b.split) AS split_b,
       |    est.doc_a, est.doc_b, a.n_tok AS ta, b.n_tok AS tb
       |  FROM est JOIN sl a ON a.doc_id = est.doc_a
       |           JOIN sl b ON b.doc_id = est.doc_b
       |  WHERE est_jaccard >= 0.7),
       |inv AS (SELECT DISTINCT split_a, split_b, doc_id, n_tok FROM (
       |    SELECT split_a, split_b, doc_a AS doc_id, ta AS n_tok FROM lab
       |    UNION ALL SELECT split_a, split_b, doc_b, tb FROM lab)),
       |ds AS (SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM inv GROUP BY 1, 2),
       |ps AS (SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM lab GROUP BY 1, 2)
       |SELECT split_a, split_b, n_pairs, n_docs, n_tokens
       |FROM ps JOIN ds USING (split_a, split_b)
       |ORDER BY split_a, split_b""".stripMargin

  // ------- trigram frequency spectrum (q246)
  /** The count-of-counts view of the n-gram vocabulary — the
    * Zipf/Good-Turing spectrum: how many word-TRIGRAM types occur
    * exactly k times (k = 1..10, 11 = "11+"), and the occurrence mass
    * each bin carries. Trigrams, not unigrams, BY MEASUREMENT: the
    * fixture's unigram vocabulary is 31 types all in the 11+ bin
    * (degenerate one-row spectrum), while trigrams spread 9 k-bins
    * with a 9.4 k-type hapax head — the shape Good-Turing smoothing
    * and contamination screens actually consume. The k=1 row is the
    * health headline: hapax-heavy = noise/IDs, hapax-starved =
    * saturated templates. Complements q159's vocab GROWTH curve with
    * the frequency AXIS at full corpus.
    *
    * Scale shape: per-doc trigram build inside the row (no
    * explode-then-window), one (trigram) count aggregate (map-side
    * combined), an ≤11-row rollup; the share join broadcasts a 1-row
    * total. */
  private def q246(s: SparkSession, d: String): DataFrame = {
    val tk = col("tk")
    val tris = when(size(tk) >= 3,
      transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
          element_at(tk, i + 2))))
      .otherwise(array().cast("array<string>"))
    val occ = docs0(s, d)
      .select(TextFunctions.tokens(col("text")).as("tk"))
      .select(explode(tris).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c"))
    val spec = occ.groupBy(least(col("c"), lit(11L)).as("k_occurrences"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_occurrences"))
    spec.crossJoin(broadcast(spec.agg(sum(col("n_types")).as("total_types"))))
      .withColumn("share_ppm", expr("n_types * 1000000 div total_types"))
      .select("k_occurrences", "n_types", "n_occurrences", "share_ppm")
      .sortedOut("k_occurrences")
  }

  private val q246Sql =
    """WITH d AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk
      |  FROM documents),
      |occ AS (SELECT tri, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(CASE WHEN len(tk) >= 3
      |      THEN list_transform(range(1, len(tk) - 1),
      |             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |      ELSE [] END) AS tri
      |    FROM d) GROUP BY 1),
      |spec AS (SELECT CAST(least(c, 11) AS BIGINT) AS k_occurrences,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(c) AS BIGINT) AS n_occurrences
      |  FROM occ GROUP BY 1)
      |SELECT k_occurrences, n_types, n_occurrences,
      |  CAST(n_types * 1000000 // (SELECT sum(n_types) FROM spec) AS BIGINT) AS share_ppm
      |FROM spec ORDER BY k_occurrences""".stripMargin

  // ------- source-pair duplication affinity (q248)
  /** The STRENGTH matrix behind q183's syndication communities: for
    * every unordered source pair, observed near-dup candidate pairs
    * (est ≥ 0.7) against the pair universe size, as lift vs
    * independence — lift_ppm = (o/P) / (u/U) in exact ppm, numerators
    * cleared through DECIMAL(38,0). Lift ≫ 1e6 between two sources is
    * a mirror/syndication relationship even when absolute counts are
    * small; the diagonal is each source's internal duplication
    * propensity. Where q183 asks "which sources CLUSTER", this asks
    * "how HARD do these two copy each other", normalized for size.
    *
    * Scale shape: one banded candidate generation, two doc_id-keyed
    * label joins, then ALL arithmetic on the |S|² source grid (tiny;
    * counts frame broadcast both ways). boundedRegistry guards the
    * source axis like q226. */
  private def q248(s: SparkSession, d: String): DataFrame = {
    val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
    val docs = docs0(s, d)
    val src = docs.select(col("doc_id"), col("source")).persistT
    val obs = Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs, k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
    val counts = graft.ops.RelationalOps.boundedRegistry(
      src.groupBy("source").agg(count(lit(1)).as("n")), 4096, "q248 source axis")
    val uni = counts.select(col("source").as("source_a"), col("n").as("na"))
      .crossJoin(counts.select(col("source").as("source_b"), col("n").as("nb")))
      .where(col("source_a") <= col("source_b"))
      .select(col("source_a"), col("source_b"),
        when(col("source_a") === col("source_b"),
          expr("na * (na - 1) div 2")).otherwise(col("na") * col("nb"))
          .as("universe_pairs"))
    val grid = uni.join(obs, Seq("source_a", "source_b"), "left_outer")
      .na.fill(0L, Seq("n_pairs"))
    val tot = grid.agg(sum(col("n_pairs")).as("p_tot"),
      sum(col("universe_pairs")).as("u_tot"))
    grid.crossJoin(broadcast(tot))
      .select(col("source_a"), col("source_b"), col("n_pairs"), col("universe_pairs"),
        when(col("p_tot") > 0 && col("universe_pairs") > 0,
          expr("CAST(CAST(n_pairs AS DECIMAL(38,0)) * u_tot * 1000000 div (CAST(p_tot AS DECIMAL(38,0)) * universe_pairs) AS BIGINT)"))
          .as("lift_ppm"))
      .sortedOut("source_a", "source_b")
  }

  private lazy val q248Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |src AS (SELECT doc_id, source FROM documents),
       |obs AS (SELECT least(a.source, b.source) AS source_a,
       |    greatest(a.source, b.source) AS source_b,
       |    CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM est JOIN src a ON a.doc_id = est.doc_a
       |           JOIN src b ON b.doc_id = est.doc_b
       |  WHERE est_jaccard >= 0.7 GROUP BY 1, 2),
       |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM src GROUP BY 1),
       |uni AS (SELECT x.source AS source_a, y.source AS source_b,
       |    CAST(CASE WHEN x.source = y.source THEN x.n * (x.n - 1) // 2
       |         ELSE x.n * y.n END AS BIGINT) AS universe_pairs
       |  FROM cnt x CROSS JOIN cnt y WHERE x.source <= y.source),
       |grid AS (SELECT uni.source_a, uni.source_b,
       |    CAST(coalesce(obs.n_pairs, 0) AS BIGINT) AS n_pairs, uni.universe_pairs
       |  FROM uni LEFT JOIN obs USING (source_a, source_b)),
       |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS p_tot,
       |    CAST(sum(universe_pairs) AS BIGINT) AS u_tot FROM grid)
       |SELECT source_a, source_b, n_pairs, universe_pairs,
       |  CASE WHEN p_tot > 0 AND universe_pairs > 0 THEN
       |    CAST(CAST(n_pairs AS HUGEINT) * u_tot * 1000000
       |      // (CAST(p_tot AS HUGEINT) * universe_pairs) AS BIGINT) END AS lift_ppm
       |FROM grid CROSS JOIN tot ORDER BY source_a, source_b""".stripMargin

  // ------- per-stratum deterministic cap (q252)
  /** Class-balanced downsampling: every (lang, source) stratum keeps
    * at most CAP documents, selected by the md5-of-id hash order — a
    * deterministic per-stratum reservoir, the "no source may dominate
    * the mix" gate that runs before token budgets (q166 water-fill
    * allocates ACROSS strata; this clips WITHIN each). Reports
    * kept/dropped docs and character mass per stratum.
    *
    * Scale shape: the kept set rides the native [[graft.plans.TopKPerKey]]
    * plan — a bounded CAP-heap per stratum per input partition, so the
    * shuffle carries ≤ CAP·partitions rows per stratum instead of the
    * stratum's whole membership (the ranking-window formulation would
    * shuffle and sort every row). Totals are one map-side-combinable
    * aggregate; the stratum axis is q248's bounded registry argument. */
  private def q252(s: SparkSession, d: String): DataFrame = {
    val cap = 10
    val docs = docs0(s, d)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .persistT
    val totals = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val kept = graft.plans.TopKPerKey
      .topK(docs, Seq("lang", "source"), Seq(col("hk"), col("doc_id")), cap)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    totals.join(kept, Seq("lang", "source"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("kept_chars"), col("total_chars"))
      .sortedOut("lang", "source")
  }

  private val q252Sql =
    """WITH r AS (SELECT lang, source, n_chars,
      |    row_number() OVER (PARTITION BY lang, source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT lang, source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(count(*) - sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(sum(CASE WHEN rn <= 10 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM r GROUP BY 1, 2 ORDER BY lang, source""".stripMargin

  // ------- near-dup cluster purity audit (q268)
  /** QUALITY of the dedup graph, not just its size: for each near-dup
    * cluster (q48's MinHash-LSH pipeline, est ≥ 0.9, union-find
    * labels), who's in it — per size band, the cluster count, how many
    * span MULTIPLE sources (the syndication/mirror signal q183
    * clusters at corpus level), and the exact dominant-source purity
    * in ppm (Σ dominant-member counts ·10⁶ div Σ sizes). A dedup
    * policy that collapses clusters to one survivor should know
    * whether it is deduping WITHIN sources (storage win) or ACROSS
    * them (provenance loss) — this is that census.
    *
    * Scale shape: everything downstream of the banded candidate
    * pipeline is (cluster, source)-grain aggregation — two map-side-
    * combinable aggs on frames bounded by the candidate-pair count;
    * text never travels. Oracle: the full signature→banding→cap→
    * union-find chain re-derived in SQL (shared CTE builders). */
  private def q268(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, k = 32), bands = 4, rowsPerBand = 8,
      minEst = 0.9)
    val mem = Dedup.nearDupClusters(pairs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val per = mem.groupBy(col("cluster"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("cluster"))
      .agg(sum(col("cnt")).as("sz"), max(col("cnt")).as("dom"),
        count(lit(1)).as("n_sources"))
    per.withColumn("size_band", expr(
        """CASE WHEN sz = 2 THEN 'a_2' WHEN sz = 3 THEN 'b_3'
          |  WHEN sz = 4 THEN 'c_4' ELSE 'd_5plus' END""".stripMargin))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("n_sources") > 1, 1L).otherwise(0L)).as("n_cross_source"),
        sum(col("sz")).as("n_docs"),
        expr("sum(dom) * 1000000 div sum(sz)").as("purity_ppm"))
      .sortedOut("size_band")
  }

  private val q268Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |p AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.9),
       |nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p) u),
       |edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b AS a, doc_a AS b FROM p),
       |${componentLabelCtes()},
       |mem AS (SELECT l.cluster, d.source FROM labels l
       |  JOIN documents d ON d.doc_id = l.doc_id),
       |cs AS (SELECT cluster, source, CAST(count(*) AS BIGINT) AS cnt
       |  FROM mem GROUP BY 1, 2),
       |per AS (SELECT cluster, CAST(sum(cnt) AS BIGINT) AS sz,
       |    CAST(max(cnt) AS BIGINT) AS dom,
       |    CAST(count(*) AS BIGINT) AS n_sources
       |  FROM cs GROUP BY 1)
       |SELECT CASE WHEN sz = 2 THEN 'a_2' WHEN sz = 3 THEN 'b_3'
       |    WHEN sz = 4 THEN 'c_4' ELSE 'd_5plus' END AS size_band,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_source,
       |  CAST(sum(sz) AS BIGINT) AS n_docs,
       |  CAST(sum(dom) * 1000000 // sum(sz) AS BIGINT) AS purity_ppm
       |FROM per GROUP BY 1 ORDER BY size_band""".stripMargin

  // ------- cross-source vocabulary overlap (q274)
  /** How much LANGUAGE do two sources share? Per source, the top-200
    * tokens by (frequency desc, token) — selected by the native
    * [[graft.plans.TopKPerKey]] bounded heap, never a source-wide
    * ranking window — then exact pairwise Jaccard over those
    * signature sets in ppm, with zero-overlap pairs kept (the full
    * pair grid is sources², a bounded registry axis). The
    * content-overlap census behind mixture design: two "different"
    * sources sharing 80% of their head vocabulary are one source for
    * diversity purposes — the corpus-level companion to per-doc
    * near-dup (q29/q48) and the input q183's communities cluster.
    *
    * Scale shape: one (source, token) census shuffle; top sets are
    * ≤ 200·|S| rows, the pair join and grid are |S|²-bounded — text
    * never travels past the first census. */
  private def q274(s: SparkSession, d: String): DataFrame = {
    val topk = 200
    val census = docs0(s, d)
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
      .persistT
    val top = graft.plans.TopKPerKey.topK(census, Seq("source"),
        Seq(negate(col("cnt")), col("tok")), topk)
      .select(col("source"), col("tok")).persistT
    val sizes = top.groupBy("source").agg(count(lit(1)).as("k"))
    val inter = top
      .join(top.select(col("source").as("source_b"), col("tok")), Seq("tok"))
      .where(col("source") < col("source_b"))
      .groupBy(col("source").as("source_a"), col("source_b"))
      .agg(count(lit(1)).as("inter"))
    val grid = sizes.select(col("source").as("source_a"), col("k").as("k_a"))
      .join(sizes.select(col("source").as("source_b"), col("k").as("k_b")))
      .where(col("source_a") < col("source_b"))
    grid.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("k_a"), col("k_b"),
        coalesce(col("inter"), lit(0L)).as("n_shared"))
      .withColumn("jaccard_ppm",
        expr("n_shared * 1000000 div (k_a + k_b - n_shared)"))
      .sortedOut("source_a", "source_b")
  }

  private val q274Sql =
    """WITH tc AS MATERIALIZED (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |        FROM documents) u
      |  WHERE len(tok) > 0 GROUP BY 1, 2),
      |top AS MATERIALIZED (SELECT source, tok FROM (
      |    SELECT source, tok, row_number() OVER (PARTITION BY source
      |      ORDER BY cnt DESC, tok) AS rn FROM tc) r
      |  WHERE rn <= 200),
      |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS k FROM top GROUP BY 1),
      |it AS (SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(count(*) AS BIGINT) AS inter
      |  FROM top a JOIN top b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2),
      |grid AS (SELECT a.source AS source_a, a.k AS k_a, b.source AS source_b, b.k AS k_b
      |  FROM sz a JOIN sz b ON a.source < b.source)
      |SELECT source_a, source_b, k_a, k_b,
      |  CAST(coalesce(inter, 0) AS BIGINT) AS n_shared,
      |  CAST(coalesce(inter, 0) * 1000000 // (k_a + k_b - coalesce(inter, 0)) AS BIGINT) AS jaccard_ppm
      |FROM grid LEFT JOIN it USING (source_a, source_b)
      |ORDER BY source_a, source_b""".stripMargin

  // ------- out-of-vocabulary rate census (q275)
  /** The tokenizer-coverage gate: fix the vocabulary at the global
    * top-1000 tokens (cnt desc, token tie-break — a
    * TakeOrderedAndProject, never a full sort) and census every
    * (lang, source) stratum's OOV exposure — token occurrences
    * outside the vocabulary, distinct OOV types, and the rate in
    * exact ppm. High-OOV strata are where a fixed-vocab model's
    * UNK mass will concentrate; this is the per-stratum number a
    * mixture designer reads next to q212's language TVD.
    *
    * Scale shape: one (stratum, token)-grain pass; the 1000-row vocab
    * BROADCASTS into the left join (never a shuffle by token), and
    * the stratum rollup is map-side-combinable. */
  private def q275(s: SparkSession, d: String): DataFrame = {
    val vocabSize = 1000
    val toks = docs0(s, d)
      .select(col("lang"), col("source"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .where(length(col("tok")) > 0)
      .persistT
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("oov_tokens"),
        countDistinct(when(col("in_v").isNull, col("tok"))).as("oov_types"))
      .withColumn("oov_ppm", expr("oov_tokens * 1000000 div n_tokens"))
      .sortedOut("lang", "source")
  }

  private val q275Sql =
    """WITH tk AS MATERIALIZED (SELECT lang, source, tok FROM (
      |    SELECT lang, source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |    FROM documents) u WHERE len(tok) > 0),
      |v AS (SELECT tok FROM (
      |    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
      |    FROM tk GROUP BY tok) r WHERE rn <= 1000)
      |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
      |  CAST(count(DISTINCT CASE WHEN v.tok IS NULL THEN tk.tok END) AS BIGINT) AS oov_types,
      |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS oov_ppm
      |FROM tk LEFT JOIN v ON tk.tok = v.tok
      |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin

  // ------- feature-hashing collision audit (q276)
  /** What does the hashing trick actually COST on this vocabulary?
    * Bucket every distinct token by md5-60(token) mod 2^b for
    * b ∈ {12, 16} (the engine-wide oracle-reproducible hash) and
    * census the collisions: buckets used, buckets holding ≥ 2 types,
    * types implicated, and — the number that matters for model
    * quality — the share of token OCCURRENCE mass sitting in collided
    * buckets, in exact ppm. The audit a feature-hashed model runs
    * before choosing its width; doubling b should visibly collapse
    * the collided-mass share.
    *
    * Scale shape: one token census shuffle, then per-b map-side
    * bucket rollups over the census — the text column never leaves
    * the first aggregate, and each leg's output is one row. */
  private def q276(s: SparkSession, d: String): DataFrame = {
    val census = docs0(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("m"))
      .withColumn("h", Hashing.h60(col("tok")))
      .persistT
    def leg(bBits: Int): DataFrame = {
      val b = 1L << bBits
      census.groupBy(pmod(col("h"), lit(b)).as("bucket"))
        .agg(count(lit(1)).as("types"), sum(col("m")).as("mass"))
        .agg(count(lit(1)).as("buckets_used"),
          sum(col("types")).as("n_types"),
          sum(col("mass")).as("n_occ"),
          sum(when(col("types") > 1, 1L).otherwise(0L)).as("buckets_collided"),
          sum(when(col("types") > 1, col("types")).otherwise(0L)).as("types_collided"),
          sum(when(col("types") > 1, col("mass")).otherwise(0L)).as("mass_collided"))
        .select(lit(b).as("n_buckets"), col("buckets_used"), col("n_types"),
          col("buckets_collided"), col("types_collided"),
          expr("mass_collided * 1000000 div n_occ").as("collided_mass_ppm"))
    }
    leg(12).unionByName(leg(16)).sortedOut("n_buckets")
  }

  private val q276Sql = {
    def leg(b: Long): String =
      s"""SELECT CAST($b AS BIGINT) AS n_buckets,
         |  CAST(count(*) AS BIGINT) AS buckets_used,
         |  CAST(sum(types) AS BIGINT) AS n_types,
         |  CAST(sum(CASE WHEN types > 1 THEN 1 ELSE 0 END) AS BIGINT) AS buckets_collided,
         |  CAST(sum(CASE WHEN types > 1 THEN types ELSE 0 END) AS BIGINT) AS types_collided,
         |  CAST(sum(CASE WHEN types > 1 THEN mass ELSE 0 END) * 1000000 // sum(mass) AS BIGINT) AS collided_mass_ppm
         |FROM (SELECT CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % $b AS bucket,
         |        CAST(count(*) AS BIGINT) AS types, CAST(sum(m) AS BIGINT) AS mass
         |      FROM tcensus GROUP BY 1) g""".stripMargin
    s"""WITH tcensus AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS m
       |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |        FROM documents) u
       |  WHERE len(tok) > 0 GROUP BY 1)
       |${leg(4096)}
       |UNION ALL
       |${leg(65536)}
       |ORDER BY n_buckets""".stripMargin
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q23_dedup_exact",        q23 _, Some(q23Sql)),
    ("q24_token_count",        q24 _, Some(q24Sql)),
    ("q25_text_quality",       q25 _, Some(q25Sql)),
    ("q26_corpus_stats",       q26 _, Some(q26Sql)),
    ("q27_lang_id",            q27 _, Some(q27Sql)),
    ("q28_jaccard_adjacent",   q28 _, Some(q28Sql)),
    ("q29_minhash_lsh_pairs",  q29 _, Some(q29Sql)),
    ("q30_simhash",            q30 _, Some(q30Sql)),
    ("q31_winnow_fingerprint", q31 _, Some(q31Sql)),
    ("q48_neardup_dedup",      q48 _, Some(q48Sql)),
    ("q56_similarity_join",    q56 _, Some(q56Sql)),
    ("q57_incremental_dedup",  q57 _, Some(q57Sql)),
    ("q60_curation_pipeline",  q60 _, Some(q60Sql)),
    ("q62_stratified_sample",  q62 _, Some(q62Sql)),
    ("q63_bm25_topk",          q63 _, Some(q63Sql)),
    ("q66_bpe_token_count",    q66 _, Some(q66Sql)),
    ("q70_token_shards",       q70 _, Some(q70Sql)),
    ("q71_mixture_sample",     q71 _, Some(q71Sql)),
    ("q72_dup_ngrams",         q72 _, Some(q72Sql)),
    ("q73_redaction",          q73 _, Some(q73Sql)),
    ("q74_decontaminate",      q74 _, Some(q74Sql)),
    ("q75_repetition_quality", q75 _, Some(q75Sql)),
    ("q79_vocab_encode",       q79 _, Some(q79Sql)),
    ("q81_cms_heavy_hitters",  q81 _, Some(q81Sql)),
    ("q86_sig_index_probe",    q86 _, Some(q86Sql)),
    ("q89_compression_quality", q89 _, Some(q89Sql)),
    ("q90_chunk_dedup_remove", q90 _, Some(q90Sql)),
    ("q93_quantile_gate",      q93 _, Some(q93Sql)),
    ("q95_dup_graph_degrees",  q95 _, Some(q95Sql)),
    ("q97_epoch_shuffle",      q97 _, Some(q97Sql)),
    ("q99_weighted_sample",    q99 _, Some(q99Sql)),
    ("q100_rag_chunks",        q100 _, Some(q100Sql)),
    ("q102_bloom_decontaminate", q102 _, Some(q74Sql)),
    ("q104_bpe_encode",        q104 _, Some(q104Sql)),
    ("q106_group_split",       q106 _, Some(q106Sql)),
    ("q112_quality_classifier", q112 _, Some(q112Sql)),
    ("q113_text_index_topk",   q113 _, Some(q63Sql)),
    ("q115_domain_cap",        q115 _, Some(q115Sql)),
    ("q116_bigram_lm",         q116 _, Some(q116Sql)),
    ("q119_containment_pairs", q119 _, Some(q119Sql)),
    ("q121_corpus_diff",       q121 _, Some(q121Sql)),
    ("q122_length_bucketing",  q122 _, Some(q122Sql)),
    ("q123_collocations",      q123 _, Some(q123Sql)),
    ("q124_cdc_chunk_stats",   q124 _, Some(q124Sql)),
    ("q125_tokenizer_fertility", q125 _, Some(q125Sql)),
    ("q127_temperature_mix",   q127 _, Some(q127Sql)),
    ("q128_sequence_packing",  q128 _, Some(q128Sql)),
    ("q130_tfidf_keywords",    q130 _, Some(q130Sql)),
    ("q132_source_scorecard",  q132 _, Some(q132Sql)),
    ("q133_leakfree_split",    q133 _, Some(q133Sql)),
    ("q134_intradoc_dedup",    q134 _, Some(q134Sql)),
    ("q135_ngram_novelty",     q135 _, Some(q135Sql)),
    ("q139_calibration_bins",  q139 _, Some(q139Sql)),
    ("q140_seqlen_coverage",   q140 _, Some(q140Sql)),
    ("q142_source_overlap",    q142 _, Some(q142Sql)),
    ("q143_kn_discounts",      q143 _, Some(q143Sql)),
    ("q145_contamination_spans", q145 _, Some(q145Sql)),
    ("q146_bootstrap_ci",      q146 _, Some(q146Sql)),
    ("q147_curriculum_phases", q147 _, Some(q147Sql)),
    ("q149_source_anomaly",    q149 _, Some(q149Sql)),
    ("q150_lsh_planner",       q150 _, Some(q150Sql)),
    ("q153_er_blocking",       q153 _, Some(q153Sql)),
    ("q154_minhash_calibration", q154 _, Some(q154Sql)),
    ("q157_preference_pairs",  q157 _, Some(q157Sql)),
    ("q158_drop_reasons",      q158 _, Some(q158Sql)),
    ("q159_vocab_growth",      q159 _, Some(q159Sql)),
    ("q160_quality_survivor",  q160 _, Some(q160Sql)),
    ("q161_classifier_auc",    q161 _, Some(q161Sql)),
    ("q163_dataset_card",      q163 _, Some(q163Sql)),
    ("q164_dupgraph_transitivity", q164 _, Some(q164Sql)),
    ("q166_token_budget",      q166 _, Some(q166Sql)),
    ("q169_source_score_norm", q169 _, Some(q169Sql)),
    ("q170_dup_direction",     q170 _, Some(q170Sql)),
    ("q171_quality_lorenz",    q171 _, Some(q171Sql)),
    ("q173_length_match_resample", q173 _, Some(q173Sql)),
    ("q174_spearman_signals",  q174 _, Some(q174Sql)),
    ("q175_negative_sampling", q175 _, Some(q175Sql)),
    ("q178_survivor_remap",    q178 _, Some(q178Sql)),
    ("q179_phrase_search",     q179 _, Some(q179Sql)),
    ("q180_sparse_cosine_join", q180 _, Some(q180Sql)),
    ("q182_boilerplate_extract", q182 _, Some(q182Sql)),
    ("q183_syndication_communities", q183 _, Some(q183Sql)),
    ("q185_url_canonical", q185 _, Some(q185Sql)),
    ("q187_warc_census", q187 _, Some(q187Sql)),
    ("q188_nfc_census", q188 _, Some(q188Sql)),
    ("q190_warc_landing", q190 _, Some(q190Sql)),
    ("q191_robots_census", q191 _, Some(q191Sql)),
    ("q192_script_census", q192 _, Some(q192Sql)),
    ("q196_ppjoin_exact", q196 _, Some(q196Sql)),
    ("q201_typo_join", q201 _, Some(q201Sql)),
    ("q242_dedup_savings", q242 _, Some(q242Sql)),
    ("q245_split_leakage", q245 _, Some(q245Sql)),
    ("q246_freq_spectrum", q246 _, Some(q246Sql)),
    ("q248_dup_affinity", q248 _, Some(q248Sql)),
    ("q252_stratum_cap", q252 _, Some(q252Sql)),
    ("q274_source_vocab_overlap", q274 _, Some(q274Sql)),
    ("q275_oov_census", q275 _, Some(q275Sql)),
    ("q276_hash_collision_audit", q276 _, Some(q276Sql)),
    ("q268_cluster_purity", q268 _, Some(q268Sql)))

  // ------- dedup-threshold savings curve (q242)
  /** The POLICY-TUNING view of the near-dup family: for candidate
    * Jaccard thresholds 0.5 / 0.7 / 0.9, how many candidate pairs
    * survive, how many docs a keep-lowest-id pass would drop (distinct
    * doc_b over surviving pairs — the upper bound the cluster pass
    * q48 then tightens), and the token mass those docs carry. This is
    * the table that prices a threshold choice in training tokens
    * BEFORE committing the full dedup run — the knob q154's
    * calibration curve sets from the other side (recall).
    *
    * One candidate generation (banded, skew-capped, q29's machinery)
    * feeds all three thresholds; each arm is a filter + two
    * map-side-combinable folds on the pair/doc grain. est = m/32 and
    * pct/100 are the same IEEE doubles in both engines, so the ≥ cut
    * is bit-portable. */
  private def q242(s: SparkSession, d: String): DataFrame = {
    val docs = docs0(s, d)
    val pairs = Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs, k = 32),
        bands = 4, rowsPerBand = 8, minEst = 0.5)
      .persistT
    val nTok = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"))
    Seq(50, 70, 90).map { pct =>
      val p = pairs.where(col("est_jaccard") >= lit(pct / 100.0))
      val removedStats = p.select(col("doc_b").as("doc_id")).distinct()
        .join(nTok, Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs_removed"),
          coalesce(sum(col("n_tok")), lit(0L)).as("tokens_removed"))
      p.agg(count(lit(1)).as("n_pairs"))
        .crossJoin(removedStats)
        .select(lit(pct.toLong).as("threshold_pct"), col("n_pairs"),
          col("n_docs_removed"), col("tokens_removed"))
    }.reduce(_ unionByName _).sortedOut("threshold_pct")
  }

  private lazy val q242Sql =
    s"""WITH ${minhashOracleCtes(32, 4, 8, 1000)},
       |nt AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents),
       |th(threshold_pct) AS (VALUES (CAST(50 AS BIGINT)), (CAST(70 AS BIGINT)), (CAST(90 AS BIGINT))),
       |sel AS (SELECT th.threshold_pct, est.doc_a, est.doc_b FROM est CROSS JOIN th
       |        WHERE est_jaccard >= CAST(threshold_pct AS DOUBLE) / 100),
       |p AS (SELECT threshold_pct, CAST(count(*) AS BIGINT) AS n_pairs FROM sel GROUP BY 1),
       |rem AS (SELECT DISTINCT threshold_pct, doc_b FROM sel),
       |r AS (SELECT threshold_pct, CAST(count(*) AS BIGINT) AS n_docs_removed,
       |        CAST(sum(n_tok) AS BIGINT) AS tokens_removed
       |      FROM rem JOIN nt ON nt.doc_id = rem.doc_b GROUP BY 1)
       |SELECT th.threshold_pct,
       |  CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       |  CAST(coalesce(r.n_docs_removed, 0) AS BIGINT) AS n_docs_removed,
       |  CAST(coalesce(r.tokens_removed, 0) AS BIGINT) AS tokens_removed
       |FROM th LEFT JOIN p USING (threshold_pct) LEFT JOIN r USING (threshold_pct)
       |ORDER BY threshold_pct""".stripMargin
}

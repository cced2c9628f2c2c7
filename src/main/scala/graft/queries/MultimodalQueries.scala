package graft.queries

import graft.ops.TrackedCache.TrackOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{Codecs, Multimodal}

/** Multimodal-column queries over the synthesized media table (binary
  * content + typed metadata derived deterministically from `documents`).
  * The catalog query is DuckDB-oracled (pure metadata arithmetic); the
  * decode/feature queries exercise the stub codec and are rows-only.
  */
object MultimodalQueries {
  import ParityQueries.Q

  private def media(s: SparkSession, d: String) =
    Multimodal.mediaFromDocuments(s, Tables.documents(s, d))

  /** Metadata catalog rollup — filters/aggregations on typed metadata
    * columns, no decode touched (the 100 TB fast path). */
  private def q36(s: SparkSession, d: String): DataFrame =
    Multimodal.toMediaFrame(media(s, d))
      .groupBy("kind", "format")
      .agg(count(lit(1)).as("n"),
           sum(col("duration_ms")).as("sum_ms"),
           sum(length(col("content"))).as("sum_bytes"))
      .orderBy("kind", "format")

  private val q36Sql =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
      |       CASE WHEN doc_id % 3 = 0 THEN 'fake-mp4' ELSE 'fake-png' END AS format,
      |       count(*) AS n,
      |       CAST(sum(n_chars * 100) AS BIGINT) AS sum_ms,
      |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes
      |FROM documents GROUP BY 1, 2 ORDER BY kind, format""".stripMargin

  /** Decode + per-image features + corpus rollup. The stub codec's
    * pixel values can't be recomputed by DuckDB (splitmix64 needs
    * wrapping 64-bit multiplication), so — q46 pattern — the query
    * outputs the image COUNT plus distribution checks computed in-plan:
    * stub pixels are iid-uniform in [0,1), so the corpus-average image
    * mean and bright-pixel ratio concentrate tightly around 0.5; the
    * booleans assert full rasters were actually decoded and reduced.
    * The sketch-/codec-specific doubles stay out of the hash. */
  private def q37(s: SparkSession, d: String): DataFrame = {
    val feats = Multimodal.imageFeatures(
      Multimodal.decodeImages(media(s, d).filter(_.kind == "image")))
    feats.toDF()
      .agg(count(lit(1)).as("n_images"),
           avg(col("mean")).as("avg_mean"),
           avg(col("p_bright")).as("avg_bright"))
      .select(col("n_images"),
        col("avg_mean").between(0.4, 0.6).as("mean_in_range"),
        col("avg_bright").between(0.4, 0.6).as("bright_in_range"))
  }

  private val q37Sql =
    """SELECT count(*) AS n_images, true AS mean_in_range, true AS bright_in_range
      |FROM documents WHERE doc_id % 3 <> 0""".stripMargin

  /** Frame sampling rollup for videos. Exactly oracled: the sampled
    * frame COUNT is pure metadata arithmetic — frames = max(1,
    * duration_ms/1000) with duration_ms = n_chars*100, keep every 2nd →
    * floor((frames+1)/2) — independent of the stub pixel bytes. */
  private def q38(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(media(s, d), every = 2)
      .toDF()
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      .orderBy("media_id")

  private val q38Sql =
    """SELECT doc_id AS media_id,
      |       CAST((greatest(1, n_chars // 10) + 1) // 2 AS BIGINT) AS n_frames
      |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin

  /** Audio modality end-to-end: stub PCM decode at 1 kHz (n_samples ==
    * duration_ms — exact metadata arithmetic), real single-pass
    * features, corpus rollup. Exact columns: clip count and total
    * samples; distribution contracts (q37 pattern): uniform-[0,1)
    * samples give corpus-average RMS ≈ sqrt(1/3) ≈ 0.577 and centered
    * zero-crossing rate ≈ 0.5. */
  private def q59(s: SparkSession, d: String): DataFrame = {
    // fused decode→features (r16): same per-row helpers as the staged
    // audioFeatures(decodeAudio(...)) — MultimodalSpec pins equality —
    // without serializing the sample arrays through the Dataset
    // encoder boundary between the two mapPartitions stages
    val feats = Multimodal.audioFeaturesFused(
      Multimodal.audioFromDocuments(s, Tables.documents(s, d)))
    feats.toDF()
      .agg(count(lit(1)).as("n_clips"),
           sum(col("n_samples")).as("sum_samples"),
           avg(col("rms")).as("avg_rms"),
           avg(col("zero_cross_rate")).as("avg_zcr"))
      .select(col("n_clips"), col("sum_samples"),
        col("avg_rms").between(0.5, 0.65).as("rms_in_range"),
        col("avg_zcr").between(0.4, 0.6).as("zcr_in_range"))
  }

  private val q59Sql =
    """SELECT count(*) AS n_clips,
      |       CAST(sum(greatest(1, n_chars * 100)) AS BIGINT) AS sum_samples,
      |       true AS rms_in_range, true AS zcr_in_range
      |FROM documents""".stripMargin

  /** Decode → nearest-neighbor resize to 3×3 → features, rolled up.
    * Exact columns: image count and total output pixels (pure
    * metadata: 9 per image); the resized-pixel distribution keeps the
    * uniform-[0,1) contract (nearest-neighbor sampling of uniform
    * pixels is uniform), checked like q37. */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val resized = Multimodal.resize(
      Multimodal.decodeImages(media(s, d).filter(_.kind == "image")), 3, 3)
    val feats = Multimodal.imageFeatures(resized)
    feats.toDF()
      .agg(count(lit(1)).as("n_images"), avg(col("mean")).as("avg_mean"))
      .crossJoin(resized.toDF().agg(
        sum(expr("width * height")).cast("long").as("sum_out_pixels")))
      .select(col("n_images"), col("sum_out_pixels"),
        col("avg_mean").between(0.4, 0.6).as("mean_in_range"))
  }

  private val q61Sql =
    """SELECT count(*) AS n_images, CAST(9 * count(*) AS BIGINT) AS sum_out_pixels,
      |       true AS mean_in_range
      |FROM documents WHERE doc_id % 3 <> 0""".stripMargin

  /** Perceptual image dedup end to end: decode → 64-bit aHash →
    * exact-group collapse → Hamming-banded near-dup pairs between the
    * DISTINCT fingerprints ([[Multimodal.phashNearDupPairs]]). The
    * query PLANTS an exact-duplicate family (every image with media_id
    * ≡ 1 mod 25 gets identical bytes+dims — re-hosted thumbnails in
    * miniature) and reports the group structure the operator recovers:
    * planted copies collapse to ONE fingerprint group, stub rasters
    * are effectively random so no cross-hash pair sits within
    * Hamming 3. Oracled by the planted arithmetic (q38 discipline);
    * the aHash invariances that make this an IMAGE operator (not a
    * byte hash) are pinned on real PNG bytes in MultimodalSpec. */
  private def q151(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = "planted-duplicate-family".getBytes("UTF-8")
    val imgs = media(s, d).filter(_.kind == "image")
      .map(m => if (m.media_id % 25 == 1) m.copy(content = planted, width = 8, height = 8) else m)
    val hashes = Multimodal.aHash64(Multimodal.decodeImages(imgs)).toDF().persistT
    val groups = hashes.groupBy("phash")
      .agg(min(col("media_id")).as("media_id"), count(lit(1)).as("n"))
      .persistT // feeds the rollup AND the pair join
    val cross = Multimodal.phashNearDupPairs(groups.select("media_id", "phash"))
    // The cross-hash pair COUNT is codec-dependent (small stub rasters
    // replicate pixels across aHash cells, so the hashes are structured,
    // not iid — at sf0.1 one accidental Hamming-3 pair exists among 3333
    // images). q37/q46 pattern: the codec-specific number stays out of
    // the hash; the oracle asserts the BOUND (near-dups among distinct
    // stub rasters are vanishingly rare), the exact columns carry the
    // planted-family recovery.
    hashes.agg(count(lit(1)).as("n_images"))
      .crossJoin(groups.agg(count(lit(1)).as("n_hash_groups"), max(col("n")).as("largest_group")))
      .crossJoin(cross.agg(count(lit(1)).as("nc")))
      .select(col("n_images"), col("n_hash_groups"), col("largest_group"),
        (col("nc") <= col("n_images") / 100).as("cross_pairs_bounded"))
  }

  private val q151Sql =
    """WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
      |pl AS (SELECT CAST(count(*) AS BIGINT) AS np FROM img WHERE doc_id % 25 = 1)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM img) AS n_images,
      |       (SELECT CAST(count(*) AS BIGINT) FROM img) - np + 1 AS n_hash_groups,
      |       np AS largest_group,
      |       true AS cross_pairs_bounded
      |FROM pl""".stripMargin

  /** Audio dedup end to end — the audio twin of q151: decode → 64-bit
    * frame-energy-delta fingerprint ([[Multimodal.audioFingerprint64]])
    * → exact-group collapse → Hamming-banded near-dup pairs. Plants an
    * exact-duplicate clip family (media_id ≡ 1 mod 25: identical
    * bytes + duration — the re-uploaded ringtone) and reports the
    * recovered group structure. Oracled by the planted arithmetic;
    * the volume-gain invariance that makes this an AUDIO operator
    * (not a byte hash) is pinned in MultimodalSpec. */
  private def q177(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = "planted-audio-duplicate-family".getBytes("UTF-8")
    val clips = Multimodal.audioFromDocuments(s, Tables.documents(s, d))
      .map(m => if (m.media_id % 25 == 1)
        m.copy(content = planted, duration_ms = 6400L) else m)
    // fused decode→fingerprint (r16) — the q59 fusion argument
    val fp = Multimodal.audioFingerprint64Fused(clips)
      .toDF().persistT
    val groups = fp.groupBy("phash")
      .agg(min(col("media_id")).as("media_id"), count(lit(1)).as("n"))
      .persistT // rollup AND pair join
    val cross = Multimodal.phashNearDupPairs(groups.select("media_id", "phash"))
    fp.agg(count(lit(1)).as("n_clips"))
      .crossJoin(groups.agg(count(lit(1)).as("n_fp_groups"),
        max(col("n")).as("largest_group")))
      .crossJoin(cross.agg(count(lit(1)).as("nc")))
      .select(col("n_clips"), col("n_fp_groups"), col("largest_group"),
        (col("nc") <= col("n_clips") / 100).as("cross_pairs_bounded"))
  }

  // n_fp_groups counts DISTINCT CONTENTS, not distinct docs: the sf0.1
  // fixture carries 8 naturally byte-identical texts among the
  // non-planted clips and the fingerprint correctly collapses them too
  // (first formulation assumed all-distinct and the ENGINE caught the
  // real duplicates the oracle missed).
  //
  // INJECTIVITY ASSUMPTION (fixture-scoped, ADVICE r7 #5): the
  // `count(distinct md5(text)) + 1` arithmetic pins that (a) distinct
  // clip bytes always yield distinct 64-bit energy-delta fingerprints
  // and (b) the planted family's fingerprint collides with no natural
  // one. The fingerprint is STRUCTURED (sign bits of frame-energy
  // deltas), not a uniform hash, so neither holds by probability —
  // they hold because MultimodalSpec's fingerprint-collision pin
  // verifies both facts against the current fixtures at every suite
  // run. If fixture regeneration ever breaks them, that spec (not a
  // silent oracle drift) is the designed tripwire.
  private val q177Sql =
    """WITH pl AS (SELECT CAST(count(*) AS BIGINT) AS np FROM documents WHERE doc_id % 25 = 1)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_clips,
      |       (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT)
      |        FROM documents WHERE doc_id % 25 <> 1) + 1 AS n_fp_groups,
      |       np AS largest_group,
      |       true AS cross_pairs_bounded
      |FROM pl""".stripMargin

  /** Bytes-first video catalog (q184) — [[Multimodal.containerMeta]]
    * over the video rows with a PLANTED real-MP4 family (media_id ≡ 0
    * mod 15: deterministic [[graft.multimodal.Codecs.minimalMp4]]
    * bytes, 6400 ms, avc1+mp4a — the q177 planting discipline, since
    * the fixture's "video" content is text). The planted rows classify
    * as `mp4` with PROBED duration/tracks/codecs (the `ftyp`/`moov`
    * box walk, not declared metadata); everything else stays
    * `unknown` with the declared duration passed through. Frame decode
    * for MP4 is explicitly out of scope — this is the classify-and-
    * measure row the real-world catalog needs so MP4 stops routing to
    * `unknown`. CodecsSpec pins the box walker itself (version 0/1
    * mvhd, largesize, truncation, non-MP4 bytes). */
  private def q184(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Codecs.minimalMp4(6400L) // avc1 + mp4a, 2 tracks
    val vids = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
      .filter(_.kind == "video")
      .map(m => if (m.media_id % 15 == 0) m.copy(content = planted) else m)
    Multimodal.containerMeta(vids).toDF()
      .groupBy("container", "codecs")
      .agg(count(lit(1)).as("n"),
        sum(col("duration_ms")).as("sum_ms"),
        sum(col("n_tracks")).cast("long").as("sum_tracks"))
      .orderBy("container")
  }

  private val q184Sql =
    """SELECT 'mp4' AS container, 'avc1,mp4a' AS codecs,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(6400 * count(*) AS BIGINT) AS sum_ms,
      |       CAST(2 * count(*) AS BIGINT) AS sum_tracks
      |FROM documents WHERE doc_id % 15 = 0
      |UNION ALL
      |SELECT 'unknown', '', CAST(count(*) AS BIGINT),
      |       CAST(sum(n_chars * 100) AS BIGINT), CAST(0 AS BIGINT)
      |FROM documents WHERE doc_id % 3 = 0 AND doc_id % 15 <> 0
      |ORDER BY container""".stripMargin

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q36_media_catalog",       q36 _, Some(q36Sql)),
    ("q37_media_features",      q37 _, Some(q37Sql)),
    ("q38_media_frame_sample",  q38 _, Some(q38Sql)),
    ("q59_audio_features",      q59 _, Some(q59Sql)),
    ("q61_media_resize",        q61 _, Some(q61Sql)),
    ("q151_phash_dedup",        q151 _, Some(q151Sql)),
    ("q177_audio_fp_dedup",     q177 _, Some(q177Sql)),
    ("q184_mp4_catalog",        q184 _, Some(q184Sql)))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

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

  /** Decode + per-image features + per-kind rollup (stub codec ⇒
    * rows-only check; the batch plumbing and stats math are real). */
  private def q37(s: SparkSession, d: String): DataFrame = {
    val feats = Multimodal.imageFeatures(
      Multimodal.decodeImages(media(s, d).filter(_.kind == "image")))
    feats.toDF()
      .agg(count(lit(1)).as("n_images"),
           avg(col("mean")).as("avg_mean"),
           avg(col("p_bright")).as("avg_bright"))
  }

  /** Frame sampling rollup for videos (rows-only). */
  private def q38(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(media(s, d), every = 2)
      .toDF()
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      .orderBy("media_id")

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q36_media_catalog",       q36 _, Some(q36Sql)),
    ("q37_media_features",      q37 _, None),
    ("q38_media_frame_sample",  q38 _, None))
}

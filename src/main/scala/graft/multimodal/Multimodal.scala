package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the LLM-data-pipeline extension (driver
  * mandate): image/audio/video as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages as partition-batched typed transforms.
  *
  * The Spark-side plumbing — schemas, Encoders, `mapPartitions` batch
  * shape, partition sizing — is real and tested. Decode dispatches per
  * row on `format`: REAL containers decode through JDK-public codecs
  * ([[Codecs]] — `javax.imageio` for png/jpeg/bmp/gif, a RIFF/PCM
  * chunk parser for wav, animated-GIF frame compositing and a
  * RIFF-walked MJPEG-in-AVI parser for video), while `fake-*` formats
  * use the deterministic [[FakeCodec]] stub, kept as the
  * exactly-reproducible oracle twin. Dirty bytes drop, with
  * [[undecodable]] for quarantine accounting; they never fail the
  * stage.
  *
  * Scale posture: media bytes never route through a shuffle — decode /
  * featurize are narrow `mapPartitions` stages; only the small derived
  * features (vectors, stats) flow into joins/aggregations. Partition
  * size is governed by `spark.sql.files.maxPartitionBytes` at scan time,
  * so a 100 TB media lake decodes in bounded-memory batches across
  * executors.
  */
object Multimodal {

  /** A media object: opaque bytes + typed metadata columns (not a
    * stringly blob — Catalyst prunes/filters on them). */
  case class MediaFile(media_id: Long, kind: String, format: String,
                       width: Int, height: Int, duration_ms: Long,
                       content: Array[Byte])

  /** Decoded raster: row-major grayscale pixels in [0,1). */
  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          pixels: Array[Float])

  case class ImageFeatures(media_id: Long, mean: Double, std: Double,
                           p_bright: Double)

  case class Frame(media_id: Long, frame_no: Int, width: Int, height: Int,
                   pixels: Array[Float])

  /** ==== STUB CODEC ====
    * Deterministic fake standing in for libjpeg/ffmpeg: pixel (x,y) is a
    * splitmix64 avalanche of (bytes-hash, x, y) mapped into [0,1). Real
    * deployments replace these two bodies with actual codecs.
    */
  object FakeCodec extends Serializable {
    private def mix(a: Long, b: Long, c: Long): Long = {
      var z = a + b * 0x9E3779B97F4A7C15L + c * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    private def bytesHash(bytes: Array[Byte]): Long =
      bytes.foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ b) * 0x100000001b3L)

    def decodeImage(content: Array[Byte], width: Int, height: Int): Array[Float] = {
      val h = bytesHash(content)
      Array.tabulate(width * height) { i =>
        val v = mix(h, i % width, i / width)
        ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
    }

    /** "Video" decode: one fake frame per 1000 ms of duration. */
    def decodeFrames(content: Array[Byte], width: Int, height: Int,
                     durationMs: Long): Iterator[(Int, Array[Float])] = {
      val h = bytesHash(content)
      val n = math.max(1, (durationMs / 1000).toInt)
      Iterator.tabulate(n) { f =>
        f -> Array.tabulate(width * height) { i =>
          val v = mix(h + f, i % width, i / width)
          ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat
        }
      }
    }
  }

  /** Decode stage: narrow partition-batched transform, one decoded
    * raster per media row, streamed through the iterator (never
    * materializes a whole partition of pixels).
    *
    * Dispatches per row on `format`: real containers the JDK can read
    * (png/jpeg/bmp/gif) decode through [[Codecs.decodeImage]]
    * (`javax.imageio`, BT.601 luma — width/height come from the actual
    * bytes, not the metadata); `fake-*` formats keep the deterministic
    * [[FakeCodec]] so oracle-pinned queries stay reproducible. Rows
    * whose bytes fail to decode are DROPPED, never crash the stage —
    * use [[undecodable]] for quarantine accounting. */
  def decodeImages(media: Dataset[MediaFile]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (Codecs.imageFormats(m.format.toLowerCase))
        Codecs.decodeImage(m.content).map { case (w, h, px) =>
          DecodedImage(m.media_id, w, h, px)
        }
      else
        Some(DecodedImage(m.media_id, m.width, m.height,
          FakeCodec.decodeImage(m.content, m.width, m.height)))
    })
  }

  /** Quarantine accounting for [[decodeImages]] / [[decodeAudio]]:
    * media_ids whose real-format bytes do NOT decode (stub formats
    * always decode). A real pipeline sinks these for inspection instead
    * of silently shrinking — same posture as the quarantining CSV
    * reader. */
  def undecodable(media: Dataset[MediaFile]): Dataset[Long] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val fmt = m.format.toLowerCase
      val ok =
        if (m.kind == "video" && Codecs.videoFormats(fmt))
          Codecs.decodeVideoFrames(m.content).isDefined
        else if (Codecs.imageFormats(fmt)) Codecs.decodeImage(m.content).isDefined
        else if (Codecs.audioFormats(fmt)) Codecs.decodeWav(m.content).isDefined
        else true
      if (ok) None else Some(m.media_id)
    })
  }

  /** Feature extraction on decoded rasters — real arithmetic (mean,
    * stddev, bright-pixel ratio), single pass per image. */
  def imageFeatures(decoded: Dataset[DecodedImage]): Dataset[ImageFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { d =>
      val n = d.pixels.length
      var s = 0.0; var s2 = 0.0; var bright = 0
      var i = 0
      while (i < n) {
        val v = d.pixels(i)
        s += v; s2 += v.toDouble * v; if (v > 0.5f) bright += 1
        i += 1
      }
      val mean = s / n
      ImageFeatures(d.media_id, mean, math.sqrt(math.max(0, s2 / n - mean * mean)),
        bright.toDouble / n)
    })
  }

  /** Real nearest-neighbor resize over the decoded raster (no stub —
    * plain array math). */
  def resize(decoded: Dataset[DecodedImage], newW: Int, newH: Int): Dataset[DecodedImage] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { d =>
      val out = Array.tabulate(newW * newH) { i =>
        val x = i % newW; val y = i / newW
        val sx = math.min(d.width - 1, x * d.width / newW)
        val sy = math.min(d.height - 1, y * d.height / newH)
        d.pixels(sy * d.width + sx)
      }
      DecodedImage(d.media_id, newW, newH, out)
    })
  }

  /** Frame sampling for video rows: decode, keep every `every`-th
    * frame — a flatMap, so output cardinality is data-dependent but the
    * decode stream stays per-row (one video's frames in memory at a
    * time, never a partition's).
    *
    * Per-row format dispatch like the image/audio stages: REAL
    * containers — animated GIF and MJPEG-in-AVI — decode through
    * [[Codecs.decodeVideoFrames]] (frame dims and count come from the
    * actual bytes; undecodable bytes drop, see [[undecodable]]);
    * `fake-*` formats keep the deterministic [[FakeCodec]] frame stub
    * as the exactly-reproducible oracle twin. */
  def sampleFrames(media: Dataset[MediaFile], every: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      if (Codecs.videoFormats(m.format.toLowerCase))
        Codecs.decodeVideoFrames(m.content).toSeq.flatMap { fs =>
          fs.iterator.zipWithIndex.collect {
            case ((w, h, px), f) if f % every == 0 => Frame(m.media_id, f, w, h, px)
          }
        }
      else
        FakeCodec.decodeFrames(m.content, m.width, m.height, m.duration_ms)
          .filter(_._1 % every == 0)
          .map { case (f, px) => Frame(m.media_id, f, m.width, m.height, px) }
    })
  }

  /** Untyped view for SQL interop: metadata columns + content stay
    * queryable (filter on kind/format/duration prunes BEFORE decode). */
  def toMediaFrame(media: Dataset[MediaFile]): DataFrame =
    media.toDF()

  case class ContainerMeta(media_id: Long, container: String, codecs: String,
                           duration_ms: Long, n_tracks: Int)

  /** Container classification from the BYTES, not the declared format —
    * what the catalog runs on a real crawl where the extension lies:
    * MP4 rows get the full [[Codecs.probeMp4]] metadata (probed
    * duration, track count, codec fourccs); GIF / MJPEG-AVI / WAV are
    * recognized by magic (their decoders are real elsewhere —
    * `decodeVideoFrames` / `decodeWav`); unprobeable bytes classify as
    * `unknown` with the declared duration passed through and zero
    * tracks. A narrow per-row map: only the ~40-byte metadata struct
    * leaves the stage, never the content. */
  def containerMeta(media: Dataset[MediaFile]): Dataset[ContainerMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val b = m.content
      def magic(s: String, off: Int): Boolean =
        b.length >= off + s.length &&
          s.zipWithIndex.forall { case (c, i) => b(off + i) == c.toByte }
      Codecs.probeMp4(b) match {
        case Some(meta) =>
          ContainerMeta(m.media_id, "mp4", meta.codecs.mkString(","),
            meta.durationMs, meta.nTracks)
        case None =>
          if (magic("GIF8", 0))
            ContainerMeta(m.media_id, "gif", "gif", m.duration_ms, 1)
          else if (magic("RIFF", 0) && magic("AVI ", 8))
            ContainerMeta(m.media_id, "avi", "mjpg", m.duration_ms, 1)
          else if (magic("RIFF", 0) && magic("WAVE", 8))
            ContainerMeta(m.media_id, "wav", "pcm", m.duration_ms, 1)
          else ContainerMeta(m.media_id, "unknown", "", m.duration_ms, 0)
      }
    })
  }

  // ------------------------------------------------- perceptual hash

  case class PHash(media_id: Long, phash: Long)

  /** 64-bit average-hash (aHash) perceptual fingerprint: sample the
    * raster down to 8×8 (the [[resize]] nearest-neighbor kernel),
    * threshold each cell against the 64-cell mean — bit i set ⇔ cell i
    * brighter than the mean. Invariant under monotone brightness
    * scaling and (approximately) under resize, which is exactly what
    * re-encoded / re-hosted image duplicates change; MultimodalSpec
    * pins both invariances on REAL PNG bytes through the
    * [[graft.multimodal.Codecs]] decode path.
    *
    * Scale shape: a narrow per-row map — 64 samples + one threshold
    * regardless of raster size; only the 8-byte hash leaves the
    * decode stage. */
  def aHash64(decoded: Dataset[DecodedImage]): Dataset[PHash] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { d =>
      val cells = new Array[Double](64)
      var i = 0
      while (i < 64) {
        val x = i % 8; val y = i / 8
        val sx = math.min(d.width - 1, x * d.width / 8)
        val sy = math.min(d.height - 1, y * d.height / 8)
        cells(i) = d.pixels(sy * d.width + sx).toDouble
        i += 1
      }
      var s = 0.0; i = 0
      while (i < 64) { s += cells(i); i += 1 }
      val mean = s / 64.0
      var h = 0L; i = 0
      while (i < 64) { if (cells(i) > mean) h |= 1L << i; i += 1 }
      PHash(d.media_id, h)
    })
  }

  /** 64-bit audio fingerprint: sign of frame-energy DELTAS — the audio
    * member of the perceptual-hash family beside [[aHash64]]. The clip
    * splits into 65 equal frames; bit b is set iff energy(b+1) >
    * energy(b). Energy comparisons are invariant under volume scaling
    * (a monotone transform of all energies preserves every pairwise
    * order), which is exactly what re-encoded / re-normalized audio
    * duplicates change — the same robustness argument as aHash's
    * brightness invariance, pinned in MultimodalSpec.
    *
    * Scale shape identical to [[aHash64]]: one narrow per-row pass
    * over the samples, 65 accumulators, only the 8-byte hash leaves
    * the decode stage; pairs ride [[phashNearDupPairs]] unchanged. */
  def audioFingerprint64(clips: Dataset[AudioClip]): Dataset[PHash] = {
    import clips.sparkSession.implicits._
    clips.mapPartitions(_.map(fingerprintOneAudio))
  }

  private def fingerprintOneAudio(c: AudioClip): PHash = {
    val frames = 65
    val e = new Array[Double](frames)
    val n = c.n_samples
    var i = 0
    while (i < n) {
      // frame index by integer proportion — exact, no fp boundary
      val f = (i.toLong * frames / n).toInt
      // energy of the DC-REMOVED signal (the [0,1) contract carries
      // PCM as v/2+0.5): gain g scales every frame energy by g², so
      // the pairwise ORDER of energies — all the hash reads — is
      // exactly invariant. Raw Σv² would mix in the offset and break
      // that.
      val v = c.samples(i).toDouble - 0.5
      e(f) += v * v
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) { if (e(b + 1) > e(b)) h |= 1L << b; b += 1 }
    PHash(c.media_id, h)
  }

  /** Fused decode→fingerprint — the [[audioFeaturesFused]] argument
    * applied to the energy-delta hash (q177's decode stage). */
  def audioFingerprint64Fused(media: Dataset[MediaFile],
                              sampleRate: Int = 1000): Dataset[PHash] = {
    import media.sparkSession.implicits._
    spreadClips(media).mapPartitions(_.flatMap(m =>
      decodeOneAudio(m, sampleRate).map(fingerprintOneAudio)))
  }

  /** Perceptual near-dup pairs by Hamming distance over [[aHash64]]
    * fingerprints — the image member of the dedup family. Banding by
    * pigeonhole: the 64-bit hash splits into `bands` equal slices; two
    * hashes within `maxDist` bit flips MUST agree on at least one
    * slice when `maxDist < bands`, so the candidate join is an EQUI
    * join on (slice-index, slice-value) — never an all-pairs scan —
    * and the exact `bit_count(xor)` verify runs only on candidates.
    *
    * Exact-duplicate families should be collapsed to one
    * representative per distinct hash BEFORE pairing (the q151
    * pattern: group by phash, carry the count) — that is what bounds
    * a hot bucket at a million identical thumbnails, the same
    * discipline as the LSH bucket cap.
    *
    * @param hashes (media_id, phash) frame
    * @return (media_a, media_b, hamming), media_a < media_b */
  def phashNearDupPairs(hashes: DataFrame, maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(maxDist < bands, s"pigeonhole recall guarantee needs maxDist < bands, got $maxDist >= $bands")
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val banded = hashes.select(col("media_id"), col("phash"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("phash"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("bno", "bval")))
    val l = banded.select(col("bno"), col("bval"),
      col("media_id").as("media_a"), col("phash").as("ha"))
    val r = banded.select(col("bno"), col("bval"),
      col("media_id").as("media_b"), col("phash").as("hb"))
    l.join(r, Seq("bno", "bval"))
      .where(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "ha", "hb")
      .distinct() // multi-band collisions collapse before the verify
      .select(col("media_a"), col("media_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .where(col("hamming") <= maxDist)
  }

  // ----------------------------------------------------------- audio

  /** Decoded audio: mono PCM samples in [0,1) at `sample_rate` Hz. */
  case class AudioClip(media_id: Long, sample_rate: Int, n_samples: Int,
                       samples: Array[Float])

  case class AudioFeatures(media_id: Long, n_samples: Int, rms: Double,
                           zero_cross_rate: Double, peak: Double)

  /** Audio decode with per-row format dispatch: `wav` rows parse the
    * real RIFF/PCM container via [[Codecs.decodeWav]] (sample_rate from
    * the fmt chunk; channels averaged to mono; samples mapped from
    * PCM's [-1,1] into this contract's [0,1) as v/2+0.5, so
    * [[audioFeatures]]' 0.5-centered crossing count is exactly the PCM
    * zero-crossing rate); undecodable wav bytes are dropped (see
    * [[undecodable]]). All other formats use the deterministic stub:
    * sample i is the same splitmix64 avalanche the image path uses, at
    * `sampleRate` Hz so n_samples == duration_ms at the 1 kHz default.
    * Swapping in further codecs changes only this dispatch. */
  def decodeAudio(media: Dataset[MediaFile], sampleRate: Int = 1000): Dataset[AudioClip] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decodeOneAudio(_, sampleRate)))
  }

  /** Per-row decode shared by [[decodeAudio]] and the fused
    * [[audioFeaturesFused]] / [[audioFingerprint64Fused]] paths — one
    * code path, so the fused variants are sample-identical by
    * construction (MultimodalSpec pins the equality end to end). */
  private def decodeOneAudio(m: MediaFile, sampleRate: Int): Option[AudioClip] =
    if (Codecs.audioFormats(m.format.toLowerCase))
      Codecs.decodeWav(m.content).map { case (rate, s) =>
        var i = 0
        while (i < s.length) { s(i) = s(i) / 2f + 0.5f; i += 1 }
        AudioClip(m.media_id, rate, s.length, s)
      }
    else {
      val n = math.max(1, (m.duration_ms * sampleRate / 1000).toInt)
      val px = FakeCodec.decodeImage(m.content, n, 1)
      Some(AudioClip(m.media_id, sampleRate, n, px))
    }

  /** Real single-pass audio features over decoded samples: RMS,
    * zero-crossing rate of the mean-centered signal, peak. */
  def audioFeatures(clips: Dataset[AudioClip]): Dataset[AudioFeatures] = {
    import clips.sparkSession.implicits._
    clips.mapPartitions(_.map(featuresOneAudio))
  }

  private def featuresOneAudio(c: AudioClip): AudioFeatures = {
    val n = c.samples.length
    var s2 = 0.0; var peak = 0.0; var crossings = 0
    var i = 0
    while (i < n) {
      val v = c.samples(i).toDouble
      s2 += v * v
      if (v > peak) peak = v
      if (i > 0 && ((c.samples(i - 1) - 0.5f) * (c.samples(i) - 0.5f) < 0f)) crossings += 1
      i += 1
    }
    AudioFeatures(c.media_id, n, math.sqrt(s2 / n),
      if (n > 1) crossings.toDouble / (n - 1) else 0.0, peak)
  }

  /** Fused decode→features (r16 optimization, guide §4): the staged
    * `audioFeatures(decodeAudio(...))` crosses the Dataset encoder
    * boundary with the full sample array — at sf0.1 that is ~150 M
    * floats serialized into Catalyst rows and deserialized back for
    * one streaming fold (decode-only measured 1.73 s of q59's 2.63 s).
    * Fusing keeps the samples as a JVM array local to one iterator
    * step; per-row results are the identical objects because both
    * paths share [[decodeOneAudio]]/[[featuresOneAudio]]. */
  def audioFeaturesFused(media: Dataset[MediaFile],
                         sampleRate: Int = 1000): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    spreadClips(media).mapPartitions(_.flatMap(m =>
      decodeOneAudio(m, sampleRate).map(featuresOneAudio)))
  }

  /** Narrow-input guard for the audio decode (r16; guide §2.5/§6):
    * the fixture documents file is ONE scan split, so the ~150 M
    * sample decode ran single-task. Redistribute when the scan is
    * narrower than the session's cores; identity on wide inputs. */
  private def spreadClips(media: Dataset[MediaFile]): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    val target = media.sparkSession.sparkContext.defaultParallelism
    if (media.queryExecution.toRdd.getNumPartitions >= target) media
    else media.repartition(target, col("media_id")).as[MediaFile]
  }

  /** Fixed-length window sampling over a clip — the audio twin of video
    * frame sampling: consecutive `windowSamples`-sized windows, keep
    * every `every`-th; a flatMap with the decode stream lazy per row. */
  def sampleWindows(clips: Dataset[AudioClip], windowSamples: Int,
                    every: Int = 2): Dataset[AudioClip] = {
    import clips.sparkSession.implicits._
    clips.mapPartitions(_.flatMap { c =>
      c.samples.grouped(windowSamples).zipWithIndex
        .filter(_._2 % every == 0)
        .map { case (w, i) => AudioClip(c.media_id * 100000 + i, c.sample_rate, w.length, w) }
    })
  }

  /** Audio table synthesized from documents (all docs; `fake-wav`) —
    * separate from [[mediaFromDocuments]] so the image/video catalog
    * queries keep their kind mapping. */
  def audioFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        lit("audio").as("kind"),
        lit("fake-wav").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        (col("n_chars") * 100).as("duration_ms"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaFile]
  }

  /** Synthesize a deterministic media table from the documents fixture —
    * the binary content is the utf-8 text (a stand-in for real files);
    * used by specs and the driver-facing multimodal queries. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
        when(col("doc_id") % 3 === 0, "fake-mp4").otherwise("fake-png").as("format"),
        (col("doc_id") % 7 + 4).cast("int").as("width"),
        (col("doc_id") % 5 + 4).cast("int").as("height"),
        (col("n_chars") * 100).as("duration_ms"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaFile]
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media: org.apache.spark.sql.Dataset[MediaFile] =
    Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf0001))

  test("media table: binary content + typed metadata, schema as declared") {
    val df = Multimodal.toMediaFrame(media)
    df.schema("content").dataType.typeName shouldBe "binary"
    df.schema("media_id").dataType.typeName shouldBe "long"
    df.where(col("kind") === "video").count() should be > 0L
    df.count() shouldBe Tables.documents(spark, sf0001).count()
  }

  test("metadata predicates prune before decode (filter is on the scan side)") {
    val plan = Multimodal.toMediaFrame(media)
      .where(col("kind") === "image").queryExecution.executedPlan.toString
    // the kind filter must not sit above a deserialization stage
    plan should include("Filter")
  }

  test("decodeImages: deterministic, correct raster size, values in [0,1)") {
    val d1 = Multimodal.decodeImages(media).orderBy("media_id").head(3)
    val d2 = Multimodal.decodeImages(media).orderBy("media_id").head(3)
    d1.zip(d2).foreach { case (a, b) => a.pixels.toSeq shouldBe b.pixels.toSeq }
    d1.foreach { d =>
      d.pixels.length shouldBe d.width * d.height
      all(d.pixels.map(_.toDouble)) should (be >= 0.0 and be < 1.0)
    }
  }

  test("imageFeatures: single-pass stats are consistent with a reference computation") {
    val d = Multimodal.decodeImages(media).orderBy("media_id").head(1)(0)
    val f = Multimodal.imageFeatures(Multimodal.decodeImages(media))
      .where(col("media_id") === d.media_id).head(1)(0)
    val px = d.pixels.map(_.toDouble)
    f.mean shouldBe px.sum / px.length +- 1e-9
    f.p_bright shouldBe px.count(_ > 0.5).toDouble / px.length +- 1e-12
  }

  test("resize: nearest-neighbor to target raster, corners preserved") {
    val resized = Multimodal.resize(Multimodal.decodeImages(media), 2, 2)
      .orderBy("media_id").head(1)(0)
    resized.width shouldBe 2
    resized.height shouldBe 2
    resized.pixels.length shouldBe 4
    val orig = Multimodal.decodeImages(media).orderBy("media_id").head(1)(0)
    resized.pixels(0) shouldBe orig.pixels(0) // top-left maps to source (0,0)
  }

  test("sampleFrames: only videos, every 2nd frame, frame count from duration") {
    val frames = Multimodal.sampleFrames(media, every = 2)
    val byId = frames.groupByKey(_.media_id).count().collect().toMap
    byId.keySet.foreach(_ % 3 shouldBe 0) // only kind=video ids
    val one = media.filter(_.kind == "video").head(1)(0)
    val expected = math.max(1, (one.duration_ms / 1000).toInt)
    byId(one.media_id) shouldBe (expected + 1) / 2
    frames.head(1)(0).pixels.length should be > 0
  }

  private def audio: org.apache.spark.sql.Dataset[MediaFile] =
    Multimodal.audioFromDocuments(spark, Tables.documents(spark, sf0001))

  test("decodeAudio: n_samples from duration at 1kHz, samples in [0,1), deterministic") {
    val clips = Multimodal.decodeAudio(audio).orderBy("media_id")
    val one = clips.head(1)(0)
    val src = audio.orderBy("media_id").head(1)(0)
    one.n_samples shouldBe math.max(1, src.duration_ms.toInt)
    all(one.samples.map(_.toDouble)) should (be >= 0.0 and be < 1.0)
    val again = Multimodal.decodeAudio(audio).orderBy("media_id").head(1)(0)
    again.samples.toSeq shouldBe one.samples.toSeq
  }

  test("audioFeatures: single-pass RMS/zcr/peak consistent with a reference computation") {
    val clips = Multimodal.decodeAudio(audio).limit(3)
    val feats = Multimodal.audioFeatures(clips).collect().map(f => f.media_id -> f).toMap
    clips.collect().foreach { c =>
      val ref = math.sqrt(c.samples.map(v => v.toDouble * v).sum / c.samples.length)
      feats(c.media_id).rms shouldBe ref +- 1e-12
      feats(c.media_id).peak shouldBe c.samples.max.toDouble +- 1e-12
      feats(c.media_id).zero_cross_rate should (be >= 0.0 and be <= 1.0)
    }
  }

  test("fused audio paths ≡ staged decode→features / decode→fingerprint (r16)") {
    val staged = Multimodal.audioFeatures(Multimodal.decodeAudio(audio))
      .collect().map(f => f.media_id -> f).toMap
    val fused = Multimodal.audioFeaturesFused(audio)
      .collect().map(f => f.media_id -> f).toMap
    fused.keySet shouldBe staged.keySet
    fused.foreach { case (id, f) =>
      val s = staged(id)
      // EXACT doubles: both paths share the same per-row helpers
      (f.n_samples, f.rms, f.zero_cross_rate, f.peak) shouldBe
        ((s.n_samples, s.rms, s.zero_cross_rate, s.peak))
    }
    val stagedFp = Multimodal.audioFingerprint64(Multimodal.decodeAudio(audio))
      .collect().map(p => p.media_id -> p.phash).toMap
    val fusedFp = Multimodal.audioFingerprint64Fused(audio)
      .collect().map(p => p.media_id -> p.phash).toMap
    fusedFp shouldBe stagedFp
  }

  test("sampleWindows: every 2nd fixed-size window, sizes preserved") {
    val clips = Multimodal.decodeAudio(audio).limit(1)
    val c = clips.head(1)(0)
    val windows = Multimodal.sampleWindows(clips, windowSamples = 100, every = 2).collect()
    val nWindows = (c.n_samples + 99) / 100
    windows.length shouldBe (nWindows + 1) / 2
    all(windows.dropRight(1).map(_.n_samples)) shouldBe 100
  }

  // ------------------------------------------------- perceptual hash

  /** Horizontal-gradient PNG; `scale`/10 darkens monotonically (what a
    * re-encode/brightness tweak does to a duplicate). */
  private def gradientPng(w: Int, h: Int, scale: Int, vertical: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = if (vertical) y * 255 / (h - 1) else x * 255 / (w - 1)
      val v = t * scale / 10
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def aHashOf(bytes: Array[Byte]): Long = {
    val (w, h, px) = graft.multimodal.Codecs.decodeImage(bytes).get
    Multimodal.aHash64(spark.createDataset(Seq(DecodedImage(1L, w, h, px))))
      .collect().head.phash
  }

  test("aHash64: invariant to brightness scaling and resize on REAL PNG bytes; orientation changes it") {
    val base = aHashOf(gradientPng(64, 64, 10))
    aHashOf(gradientPng(64, 64, 6)) shouldBe base // darkened re-encode
    aHashOf(gradientPng(16, 16, 10)) shouldBe base // re-hosted thumbnail
    val vert = aHashOf(gradientPng(64, 64, 10, vertical = true))
    vert should not be base
    java.lang.Long.bitCount(base ^ vert) should be > 3
  }

  test("phashNearDupPairs: banded equi join finds pairs within Hamming 3, verify drops beyond") {
    val h0 = 0x0F0F0F0F0F0F0F0FL
    val h1 = h0 ^ 0x7L // 3 flips, all in band 0
    val h2 = h0 ^ ((1L << 1) | (1L << 17) | (1L << 33)) // 3 flips across 3 bands
    val far = ~h0
    val df = Seq((1L, h0), (2L, h1), (3L, h2), (4L, far)).toDF("media_id", "phash")
    val pairs = Multimodal.phashNearDupPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    pairs should contain((1L, 2L, 3))  // shares bands 1-3
    pairs should contain((1L, 3L, 3))  // shares only band 3 — pigeonhole recall
    // h1 vs h2 share band 3 so they ARE a candidate, but hamming 4 > 3:
    // the exact verify must drop them
    pairs.map(p => (p._1, p._2)) should not contain ((2L, 3L))
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 4L))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.phashNearDupPairs(df, maxDist = 4, bands = 4)
  }

  test("audioFingerprint64: invariant to volume gain; content changes it; identical clips collide") {
    import graft.multimodal.Multimodal.AudioClip
    // deterministic pseudo-signal around the 0.5 DC offset
    def clip(id: Long, seed: Int, gain: Double): AudioClip = {
      val n = 13000
      val s = new Array[Float](n)
      var x = seed.toLong
      for (i <- 0 until n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        val pcm = ((x >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 2 // [-1,1)
        s(i) = (pcm * gain / 2 + 0.5).toFloat
      }
      AudioClip(id, 1000, n, s)
    }
    def fpOf(c: AudioClip): Long =
      Multimodal.audioFingerprint64(spark.createDataset(Seq(c)))
        .collect().head.phash
    val base = fpOf(clip(1, 42, 1.0))
    fpOf(clip(1, 42, 0.3)) shouldBe base  // re-normalized upload (gain 0.3)
    fpOf(clip(1, 42, 0.05)) shouldBe base // heavily attenuated copy
    val other = fpOf(clip(2, 43, 1.0))
    other should not be base
    java.lang.Long.bitCount(base ^ other) should be > 3
    // byte-identical clips collide exactly (the dedup group contract)
    fpOf(clip(99, 42, 1.0)) shouldBe base
  }

  test("q177 oracle injectivity pin: distinct clip bytes → distinct fingerprints on the fixture; planted fp disjoint") {
    // The q177 oracle's `count(distinct md5(text)) + 1` arithmetic rests
    // on two facts about the STRUCTURED energy-delta fingerprint that
    // don't hold by probability (it isn't a uniform hash): (a) on this
    // fixture, distinct clip contents never share a sign pattern, and
    // (b) the planted family's fingerprint collides with no natural one.
    // This pin verifies both directly so a fixture regeneration that
    // breaks either fails HERE, loudly, instead of silently skewing the
    // oracle (ADVICE r7 #5).
    val planted = "planted-audio-duplicate-family".getBytes("UTF-8")
    val clips = Multimodal.audioFromDocuments(spark, Tables.documents(spark, sf0001))
      .map(m => if (m.media_id % 25 == 1)
        m.copy(content = planted, duration_ms = 6400L) else m)
    val fp = Multimodal.audioFingerprint64(Multimodal.decodeAudio(clips))
      .toDF().persist()
    val natural = fp.where(col("media_id") % 25 =!= 1)
      .join(Tables.documents(spark, sf0001)
        .select(col("doc_id").as("media_id"), md5(col("text")).as("content_key")),
        Seq("media_id"))
    // (a) fingerprint groups == content groups among natural clips:
    // every byte-distinct clip gets its own fingerprint, byte-identical
    // clips collide — exactly the oracle's count(distinct md5(text))
    val nContents = natural.select("content_key").distinct().count()
    natural.select("phash").distinct().count() shouldBe nContents
    // (b) the planted fingerprint never occurs among natural clips
    val plantedFp = fp.where(col("media_id") % 25 === 1)
      .select("phash").distinct().collect()
    plantedFp.length shouldBe 1
    natural.where(col("phash") === plantedFp.head.getLong(0)).count() shouldBe 0L
    fp.unpersist()
  }
}

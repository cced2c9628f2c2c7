package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

import graft.multimodal.{Codecs, Multimodal}
import graft.multimodal.Multimodal.{FakeCodec, MediaFile}

/** Real-codec round trips (VERDICT r4 item 3): actual PNG/BMP/JPEG
  * bytes through `javax.imageio`, actual RIFF/PCM WAV bytes through the
  * chunk parser — plus the dirty-bytes drop/quarantine contract and the
  * fake-format stub twin staying intact. */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  /** w×h gray gradient encoded with the JDK's own writer. */
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = ((x + y * w) * 255 / (w * h - 1)).min(255)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  private def grayExpected(w: Int, h: Int): Array[Float] =
    Array.tabulate(w * h) { i => (((i * 255 / (w * h - 1)).min(255)) / 255.0).toFloat }

  /** Hand-built RIFF/WAVE: PCM fmt chunk, an interleaved LIST chunk the
    * parser must skip, then data. */
  private def wavBytes(rate: Int, bits: Int, channels: Int,
                       frames: Seq[Seq[Int]]): Array[Byte] = {
    val bytesPer = bits / 8
    val data = ByteBuffer.allocate(frames.length * channels * bytesPer)
      .order(ByteOrder.LITTLE_ENDIAN)
    frames.foreach(_.foreach { v =>
      bits match {
        case 8  => data.put((v + 128).toByte) // 8-bit wav is unsigned
        case 16 => data.putShort(v.toShort)
        case 24 => data.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte)
        case 32 => data.putInt(v)
      }
    })
    val list = "junkmeta".getBytes("US-ASCII")
    val body = ByteBuffer.allocate(4 + 8 + 16 + 8 + list.length + 8 + data.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    body.put("WAVE".getBytes("US-ASCII"))
    body.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * bytesPer).putShort((channels * bytesPer).toShort)
      .putShort(bits.toShort)
    body.put("LIST".getBytes("US-ASCII")).putInt(list.length).put(list)
    body.put("data".getBytes("US-ASCII")).putInt(data.capacity()).put(data.array())
    val out = ByteBuffer.allocate(8 + body.capacity()).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.capacity()).put(body.array())
    out.array()
  }

  private def mediaOf(rows: (Long, String, Array[Byte])*) =
    rows.map { case (id, fmt, bytes) =>
      MediaFile(id, if (Codecs.audioFormats(fmt)) "audio" else "image",
        fmt, 0, 0, 0L, bytes)
    }.toDS()

  test("PNG and BMP round-trip: JDK-encoded gradient decodes to exact BT.601 luma") {
    for (fmt <- Seq("png", "bmp")) {
      val out = Multimodal.decodeImages(mediaOf((1L, fmt, imageBytes(fmt, 6, 4)))).collect()
      out.length shouldBe 1
      out(0).width shouldBe 6
      out(0).height shouldBe 4
      // r=g=b so luma == g/255 regardless of the weights
      out(0).pixels.zip(grayExpected(6, 4)).foreach { case (got, want) =>
        got shouldBe want +- 1e-6f
      }
    }
  }

  test("JPEG decode: real lossy bytes — correct raster, gradient within codec error") {
    val out = Multimodal.decodeImages(mediaOf((1L, "jpeg", imageBytes("jpeg", 8, 8)))).collect()
    out.length shouldBe 1
    out(0).width shouldBe 8
    out(0).pixels.length shouldBe 64
    val err = out(0).pixels.zip(grayExpected(8, 8)).map { case (a, b) => math.abs(a - b) }
    err.max should be < 0.15f // JPEG quantization, not a decode bug
    all(out(0).pixels.map(_.toDouble)) should (be >= 0.0 and be <= 1.0)
  }

  test("WAV 16-bit stereo with a LIST chunk: fmt-chunk rate, mono downmix, [0,1) mapping") {
    val frames = (0 until 64).map { i =>
      val v = (math.sin(2 * math.Pi * i / 16) * 16384).toInt
      Seq(v + 100, v - 100) // stereo pair averaging back to v
    }
    val clips = Multimodal.decodeAudio(mediaOf((7L, "wav", wavBytes(8000, 16, 2, frames)))).collect()
    clips.length shouldBe 1
    clips(0).sample_rate shouldBe 8000
    clips(0).n_samples shouldBe 64
    clips(0).samples.zipWithIndex.foreach { case (got, i) =>
      val pcm = (math.sin(2 * math.Pi * i / 16) * 16384).toInt / 32768.0
      got shouldBe (pcm / 2 + 0.5).toFloat +- 1e-4f
    }
  }

  test("WAV 8-bit mono: unsigned samples decode exactly") {
    val vals = Seq(-128, -64, 0, 63, 127)
    val clips = Multimodal.decodeAudio(
      mediaOf((8L, "wav", wavBytes(44100, 8, 1, vals.map(Seq(_)))))).collect()
    clips(0).sample_rate shouldBe 44100
    clips(0).samples.zip(vals).foreach { case (got, v) =>
      got shouldBe (v / 128.0 / 2 + 0.5).toFloat +- 1e-7f
    }
  }

  test("dirty bytes drop, never crash; undecodable() quarantines exactly them") {
    val png = imageBytes("png", 6, 4)
    val ds = mediaOf(
      (1L, "png", png),
      (2L, "png", png.take(10)),                   // truncated
      (3L, "png", Array.fill[Byte](32)(0x5a)),     // wrong magic
      (4L, "wav", wavBytes(8000, 16, 1, Seq(Seq(5)))),
      (5L, "wav", "RIFFxxxxWAVEfmt broken".getBytes("US-ASCII")),
      (6L, "fake-png", "anything".getBytes("US-ASCII"))) // stub always decodes
    Multimodal.decodeImages(ds.filter(_.kind == "image")).collect()
      .map(_.media_id).sorted shouldBe Array(1L, 6L)
    Multimodal.decodeAudio(ds.filter(_.kind == "audio")).collect()
      .map(_.media_id).sorted shouldBe Array(4L)
    Multimodal.undecodable(ds).collect().sorted shouldBe Array(2L, 3L, 5L)
  }

  test("fake-* formats keep the deterministic stub twin bit-for-bit") {
    val content = "oracle twin content".getBytes("UTF-8")
    val ds = Seq(MediaFile(9L, "image", "fake-png", 5, 3, 0L, content)).toDS()
    val out = Multimodal.decodeImages(ds).collect()(0)
    out.pixels.toSeq shouldBe FakeCodec.decodeImage(content, 5, 3).toSeq
  }

  // ------------------------------------------------------------ video

  /** Solid-gray full-screen frame. */
  private def grayFrame(w: Int, h: Int, g: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (g << 16) | (g << 8) | g)
    img
  }

  /** Animated GIF via the JDK's own sequence writer, with optional
    * per-frame (left, top) offsets written through the gif image
    * metadata tree — real inter-frame optimization, not full frames. */
  private def gifBytes(frames: Seq[(BufferedImage, Int, Int)]): Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    import javax.imageio.{IIOImage, ImageTypeSpecifier}
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, left, top) =>
      val md = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val kids = tree.getChildNodes
      var i = 0
      while (i < kids.getLength) {
        val n = kids.item(i)
        if (n.getNodeName == "ImageDescriptor") {
          n.getAttributes.getNamedItem("imageLeftPosition").setNodeValue(left.toString)
          n.getAttributes.getNamedItem("imageTopPosition").setNodeValue(top.toString)
        }
        i += 1
      }
      md.setFromTree(fmt, tree)
      writer.writeToSequence(new IIOImage(img, null, md), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Hand-assembled MJPEG-in-AVI: RIFF('AVI ') with a LIST('movi')
    * holding one `00dc` chunk per JPEG frame — the real container
    * layout the RIFF walker must navigate. */
  private def aviBytes(jpegs: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    val movi = "movi".getBytes("US-ASCII") ++ jpegs.flatMap(chunk("00dc", _))
    val body = "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi)
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  test("animated GIF: real multi-frame decode — frame count, dims, per-frame luma") {
    val bytes = gifBytes(Seq(64, 128, 192).map(g => (grayFrame(5, 4, g), 0, 0)))
    val frames = Codecs.decodeVideoFrames(bytes).get
    frames.length shouldBe 3
    frames.zip(Seq(64, 128, 192)).foreach { case ((w, h, px), g) =>
      w shouldBe 5; h shouldBe 4
      all(px.map(_.toDouble)) shouldBe (g / 255.0) +- 1e-6
    }
  }

  test("animated GIF: sub-rectangle frame composites at its offset over the canvas") {
    // frame 0: full 6x6 at gray 40; frame 1: 2x2 patch of gray 200 at (3, 2)
    val bytes = gifBytes(Seq((grayFrame(6, 6, 40), 0, 0), (grayFrame(2, 2, 200), 3, 2)))
    val frames = Codecs.decodeVideoFrames(bytes).get
    frames.length shouldBe 2
    val (w, h, f1) = frames(1)
    w shouldBe 6; h shouldBe 6
    for (y <- 0 until 6; x <- 0 until 6) {
      val want = if (x >= 3 && x < 5 && y >= 2 && y < 4) 200 / 255.0 else 40 / 255.0
      f1(y * 6 + x).toDouble shouldBe want +- 1e-6
    }
  }

  test("MJPEG-in-AVI: RIFF-walked container, per-frame JPEG decode") {
    def jpeg(g: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(grayFrame(8, 6, g), "jpeg", bos)); bos.toByteArray
    }
    val frames = Codecs.decodeVideoFrames(aviBytes(Seq(jpeg(50), jpeg(150), jpeg(250)))).get
    frames.length shouldBe 3
    frames.zip(Seq(50, 150, 250)).foreach { case ((w, h, px), g) =>
      w shouldBe 8; h shouldBe 6
      // JPEG is lossy; solid frames decode within quantization error
      all(px.map(_.toDouble)) shouldBe (g / 255.0) +- 0.02
    }
  }

  test("sampleFrames dispatches real video containers and keeps the stub twin") {
    val gif = gifBytes(Seq(60, 120, 180, 240).map(g => (grayFrame(4, 3, g), 0, 0)))
    val stub = "stub video".getBytes("UTF-8")
    val ds = Seq(
      MediaFile(1L, "video", "gif", 0, 0, 0L, gif),
      MediaFile(2L, "video", "fake-mp4", 4, 3, 3000L, stub),
      MediaFile(3L, "image", "png", 0, 0, 0L, imageBytes("png", 4, 3))).toDS()
    val out = Multimodal.sampleFrames(ds, every = 2).collect()
    // gif: frames 0 and 2 of 4; stub: frames 0 and 2 of 3; image row ignored
    out.filter(_.media_id == 1L).map(_.frame_no).sorted shouldBe Array(0, 2)
    out.filter(_.media_id == 1L).foreach { f => f.width shouldBe 4; f.height shouldBe 3 }
    val stubFrames = out.filter(_.media_id == 2L)
    stubFrames.map(_.frame_no).sorted shouldBe Array(0, 2)
    stubFrames.find(_.frame_no == 0).get.pixels.toSeq shouldBe
      FakeCodec.decodeFrames(stub, 4, 3, 3000L).next()._2.toSeq
  }

  test("dirty video bytes drop and quarantine; truncated GIF keeps leading frames") {
    val gif = gifBytes(Seq(64, 128, 192).map(g => (grayFrame(5, 4, g), 0, 0)))
    val ds = Seq(
      MediaFile(1L, "video", "gif", 0, 0, 0L, gif),
      MediaFile(2L, "video", "gif", 0, 0, 0L, "GIF8 but garbage after".getBytes("US-ASCII")),
      MediaFile(3L, "video", "avi", 0, 0, 0L, Array.fill[Byte](24)(0x11))).toDS()
    Multimodal.sampleFrames(ds, every = 1).collect().map(_.media_id).distinct.sorted shouldBe Array(1L)
    Multimodal.undecodable(ds).collect().sorted shouldBe Array(2L, 3L)
    // a GIF cut mid-animation still yields the frames before the cut
    val cut = Codecs.decodeGifFrames(gif.take(gif.length - 12))
    cut.isDefined shouldBe true
    cut.get.length should be >= 1
    cut.get.length should be < 3
  }

  test("real image features flow through the existing single-pass stats stage") {
    val feats = Multimodal.imageFeatures(
      Multimodal.decodeImages(mediaOf((1L, "png", imageBytes("png", 6, 4))))).collect()
    feats.length shouldBe 1
    val px = grayExpected(6, 4).map(_.toDouble)
    feats(0).mean shouldBe px.sum / px.length +- 1e-6
    feats(0).p_bright shouldBe px.count(_ > 0.5).toDouble / px.length +- 1e-12
  }

  // ------------------------------------------------ MP4 metadata probe

  test("probeMp4: minimal real MP4 round-trips brand, duration, tracks, codecs") {
    val b = Codecs.minimalMp4(6400L, Seq("avc1", "mp4a"))
    val meta = Codecs.probeMp4(b).get
    meta.brand shouldBe "isom"
    meta.durationMs shouldBe 6400L
    meta.nTracks shouldBe 2
    meta.codecs shouldBe Seq("avc1", "mp4a")
    // single-track, non-default timescale: duration converts through it
    val v = Codecs.probeMp4(Codecs.minimalMp4(5000L, Seq("hvc1"), timescale = 90000)).get
    v.durationMs shouldBe 5000L +- 1 // 90 kHz units round-trip within 1 ms
    v.nTracks shouldBe 1
    v.codecs shouldBe Seq("hvc1")
  }

  test("probeMp4: version-1 mvhd (64-bit times) and largesize boxes parse") {
    def be32(x: Long) = Array[Byte]((x >>> 24).toByte, (x >>> 16).toByte, (x >>> 8).toByte, x.toByte)
    def be64(x: Long) = be32(x >>> 32) ++ be32(x & 0xffffffffL)
    def box(t: String, p: Array[Byte]) = be32(p.length + 8L) ++ t.getBytes("US-ASCII") ++ p
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ // version 1, ctime/mtime 64-bit
        be32(1000L) ++ be64(7200L) ++ new Array[Byte](80))
    val ftyp = box("ftyp", "mp42".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    // moov carried in a LARGESIZE box (size == 1 + 64-bit size)
    val moovPayload = mvhdV1
    val moovLarge = be32(1L) ++ "moov".getBytes("US-ASCII") ++
      be64(moovPayload.length + 16L) ++ moovPayload
    val meta = Codecs.probeMp4(ftyp ++ moovLarge).get
    meta.brand shouldBe "mp42"
    meta.durationMs shouldBe 7200L
    meta.nTracks shouldBe 0
  }

  test("probeMp4: non-MP4, truncated, and box-overrun bytes all return None") {
    Codecs.probeMp4("plain text content, definitely not a movie".getBytes("UTF-8")) shouldBe None
    Codecs.probeMp4(Array.emptyByteArray) shouldBe None
    val good = Codecs.minimalMp4(6400L)
    // cut into the moov payload (the trailing mdat is 12 bytes):
    // moov's declared size now overruns the buffer
    Codecs.probeMp4(good.take(good.length - 13)) shouldBe None
    // declared box size exceeding the file is malformed, not a crash
    val corrupt = good.clone()
    corrupt(good.length - 12) = 0x7f // inflate the trailing mdat's size field
    Codecs.probeMp4(corrupt) shouldBe None
  }

  test("containerMeta: bytes-first classification across mp4/gif/wav/unknown") {
    val mp4 = Codecs.minimalMp4(6400L)
    val wav = wavBytes(8000, 16, 1, Seq.fill(100)(Seq(8192)))
    val rows = Multimodal.containerMeta(mediaOf(
        (1L, "whatever", mp4), (2L, "fake-mp4", "just some text".getBytes("UTF-8")),
        (3L, "wav", wav)))
      .collect().map(c => c.media_id -> ((c.container, c.codecs, c.n_tracks))).toMap
    rows(1L) shouldBe (("mp4", "avc1,mp4a", 2))
    rows(2L)._1 shouldBe "unknown"
    rows(3L) shouldBe (("wav", "pcm", 1))
  }
}

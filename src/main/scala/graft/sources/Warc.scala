package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) record building + parsing — the
  * container CRAWL corpora actually arrive in (Common Crawl ships
  * ~1 GB `.warc.gz` files), i.e. the ingestion step BEFORE the q182
  * boilerplate pass ever sees HTML. Same bytes-first discipline as the
  * ISO-BMFF walker (`multimodal/Codecs.probeMp4`) and the RIFF walker:
  * pure-JDK byte kernels, no external library, deterministic planted
  * fixtures (the `documents` table has no WARC column, so q187
  * synthesizes each document's WARC bytes and the oracle states what
  * the parse MUST recover directly from the source columns).
  *
  * Format notes (the portable core of the spec):
  *   - a record is `WARC/1.0\r\n` + header lines + `\r\n` +
  *     Content-Length payload bytes + `\r\n\r\n`;
  *   - records concatenate back-to-back into one file;
  *   - `.warc.gz` is each record gzipped as its OWN member, members
  *     concatenated (so a reader can seek to a member boundary) —
  *     [[gunzipAll]] inflates all members ([[GZIPInputStream]] handles
  *     member concatenation natively).
  *
  * Parsing is CONTENT-LENGTH-DRIVEN, never delimiter-driven: a payload
  * that embeds the bytes `WARC/1.0\r\n` must not split the record
  * (WarcSpec pins this), and a Content-Length pointing past EOF
  * salvages the available bytes and flags `truncated` instead of
  * throwing — the behavior a 100 TB crawl ingest needs on the last,
  * cut-off record of an interrupted transfer.
  *
  * Scale shape: the unit of parallelism is the FILE (the reason crawl
  * archives ship as many ~1 GB members): [[scan]] maps one task per
  * file via the `binaryFile` source and the per-record kernel below;
  * nothing but the parsed census ever leaves the scan stage.
  */
object Warc {

  /** One parsed record. `declaredLength` is the header's
    * Content-Length; `truncated` means fewer payload bytes were
    * available than declared (payload holds the salvage). */
  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      declaredLength: Long,
      payload: Array[Byte],
      truncated: Boolean)

  /** Fixed fixture timestamp — WARC-Date is mandatory per spec but any
    * real value would break run-to-run determinism. */
  val FixtureDate = "2026-01-01T00:00:00Z"

  private val Crlf = "\r\n"
  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // ------------------------------------------------------------ build

  /** One well-formed record: version line, headers, Content-Length,
    * blank line, payload, double-CRLF terminator. */
  def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0").append(Crlf)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(Crlf) }
    sb.append("Content-Length: ").append(payload.length).append(Crlf).append(Crlf)
    val head = ascii(sb.toString)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head)
    out.write(payload)
    out.write(ascii(Crlf + Crlf))
    out.toByteArray
  }

  /** Minimal HTTP/1.1 response payload (status line + headers + body)
    * for `application/http;msgtype=response` records. */
  def httpResponse(body: Array[Byte], status: Int = 200): Array[Byte] = {
    val reason = if (status == 200) "OK" else "Status"
    val head = ascii(s"HTTP/1.1 $status $reason${Crlf}Content-Type: text/plain; charset=utf-8${Crlf}Content-Length: ${body.length}$Crlf$Crlf")
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head)
    out.write(body)
    out.toByteArray
  }

  /** Deterministic per-document WARC fixture: warcinfo + request +
    * response (the response body is the document text), the standard
    * record triple a crawler writes per fetch. `truncateTail` chops
    * bytes off the END of the stream (an interrupted transfer);
    * `gzipPerRecord` emits the real `.warc.gz` layout (one gzip member
    * per record, members concatenated). The two are mutually exclusive
    * in q187's planting (truncation wins) so each flag is observable
    * on its own. */
  def warcForDoc(docId: Long, source: String, lang: String, text: String,
                 truncateTail: Int = 0, gzipPerRecord: Boolean = false): Array[Byte] = {
    val uri = s"https://$source.example.com/$lang/post/${docId % 50}"
    val info = record(
      Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> FixtureDate,
        "WARC-Record-ID" -> s"<urn:graft:$docId:info>"),
      ascii(s"software: graft-warc/1.0$Crlf"))
    val req = record(
      Seq("WARC-Type" -> "request", "WARC-Date" -> FixtureDate,
        "WARC-Record-ID" -> s"<urn:graft:$docId:req>",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http;msgtype=request"),
      ascii(s"GET /$lang/post/${docId % 50} HTTP/1.1${Crlf}Host: $source.example.com$Crlf$Crlf"))
    val resp = record(
      Seq("WARC-Type" -> "response", "WARC-Date" -> FixtureDate,
        "WARC-Record-ID" -> s"<urn:graft:$docId:resp>",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http;msgtype=response"),
      httpResponse(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val recs = Seq(info, req, resp)
    val whole =
      if (gzipPerRecord) recs.map(gzipMember).reduce(_ ++ _)
      else recs.reduce(_ ++ _)
    if (truncateTail > 0) whole.dropRight(truncateTail) else whole
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(bytes)
    gz.finish()
    gz.close()
    out.toByteArray
  }

  // ------------------------------------------------------------ parse

  /** gzip magic. */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Inflate ALL concatenated gzip members. A truncated or corrupt
    * member salvages the bytes inflated so far instead of throwing —
    * same contract as the Content-Length salvage below: one cut-off
    * `.warc.gz` must not fail a whole ingest task. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 4 + 64)
    try {
      val gz = new GZIPInputStream(new ByteArrayInputStream(bytes), 65536)
      val buf = new Array[Byte](65536)
      var n = gz.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = gz.read(buf) }
    } catch {
      case _: java.io.EOFException | _: java.util.zip.ZipException => ()
    }
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val Magic = ascii("WARC/")
  private val HeaderEnd = ascii(Crlf + Crlf)

  /** Content-Length-driven record walk; gunzips first when the stream
    * is gzipped. Best-effort on malformation: garbage between records
    * is skipped to the next `WARC/` magic; a record whose header block
    * never terminates is dropped; a missing/garbage/negative
    * Content-Length reads as 0 (the rest of that record's bytes are
    * then skipped as garbage up to the next magic); a Content-Length
    * past EOF salvages what's there and flags `truncated`. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val plain = if (isGzip(bytes)) gunzipAll(bytes) else bytes
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var done = false
    while (!done) {
      val start = indexOf(plain, Magic, pos)
      if (start < 0) done = true
      else {
        val hEnd = indexOf(plain, HeaderEnd, start)
        if (hEnd < 0) done = true
        else {
          val headerStr = new String(plain, start, hEnd - start,
            java.nio.charset.StandardCharsets.UTF_8)
          val hs: Map[String, String] = headerStr.split("\r\n").iterator.drop(1)
            .flatMap { line =>
              val i = line.indexOf(':')
              if (i < 0) None
              else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
            }.toMap
          val cl = math.max(0L,
            hs.get("content-length").flatMap(_.toLongOption).getOrElse(0L))
          val pStart = hEnd + HeaderEnd.length
          val avail = math.max(0, plain.length - pStart)
          val take = math.min(cl, avail.toLong).toInt
          val payload = java.util.Arrays.copyOfRange(plain, pStart, pStart + take)
          out += WarcRecord(
            hs.getOrElse("warc-type", ""),
            hs.getOrElse("warc-target-uri", ""),
            cl, payload, take < cl)
          pos = pStart + take
        }
      }
    }
    out.result()
  }

  /** (status, body) of an `application/http` response payload: status
    * from the first line's second token, body after the first blank
    * line. A payload with no header terminator (severe truncation)
    * reports (0, empty). */
  def httpBody(payload: Array[Byte]): (Long, Array[Byte]) = {
    val sep = indexOf(payload, HeaderEnd, 0)
    if (sep < 0) return (0L, Array.emptyByteArray)
    val eol = indexOf(payload, ascii(Crlf), 0)
    val line = new String(payload, 0, if (eol < 0) sep else eol,
      java.nio.charset.StandardCharsets.UTF_8)
    val status = line.split(" ").drop(1).headOption
      .flatMap(_.toLongOption).getOrElse(0L)
    (status, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }

  // ------------------------------------------------------------- scan

  /** WARC ingestion as a DataFrame source: one task per `.warc` /
    * `.warc.gz` file (the crawl-archive unit of parallelism) via the
    * built-in `binaryFile` source, records flat-mapped by the kernel
    * above. Columns: (path, warc_type, target_uri, declared_length,
    * payload_length, truncated). Payload BYTES stay in the scan stage —
    * callers project what they need (the q187 census shape) before
    * anything shuffles. */
  def scan(spark: SparkSession, glob: String): DataFrame =
    scanRecords(spark.read.format("binaryFile").load(glob))

  /** STREAMING twin of [[scan]]: watch a landing directory as a
    * Structured Streaming file source — the live-crawl shape where
    * `.warc.gz` members keep arriving and each must be parsed exactly
    * once (file-source offsets track processed files, so a restart
    * resumes without re-parsing). Same kernel, same columns; one task
    * per NEW file per micro-batch. `maxFilesPerTrigger` caps batch
    * size so a backlog drains in bounded bites. */
  def scanStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 100): DataFrame =
    scanRecords(spark.readStream.format("binaryFile")
      .schema("path string, modificationTime timestamp, length long, content binary")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.warc*")
      .load(dir))

  private def scanRecords(files: DataFrame): DataFrame = {
    import files.sparkSession.implicits._
    files
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parse(bytes).map(r =>
          (path, r.warcType, r.targetUri, r.declaredLength,
            r.payload.length.toLong, r.truncated))
      }
      .toDF("path", "warc_type", "target_uri", "declared_length",
        "payload_length", "truncated")
  }
}

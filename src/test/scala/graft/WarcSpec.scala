package graft

import java.nio.file.Files

import graft.sources.Warc

/** Pins for the WARC kernel cited by `sources/Warc.scala` (VERDICT r8
  * items 2 and 9): content-length-driven parsing (embedded `WARC/1.0`
  * must not split a record), truncation salvage at both the record and
  * the gzip grain, multi-member `.warc.gz` inflation, HTTP payload
  * splitting, and the file-grain `scan` over the binaryFile source —
  * the "unit of parallelism is the FILE" claim, end-to-end. */
class WarcSpec extends SparkSpec {

  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("record round-trip: triple parses back with types, uris, payloads") {
    val bytes = Warc.warcForDoc(7L, "web", "en", "hello warc body")
    val recs = Warc.parse(bytes)
    recs.map(_.warcType) shouldBe Seq("warcinfo", "request", "response")
    recs.count(_.truncated) shouldBe 0
    val resp = recs.find(_.warcType == "response").get
    resp.targetUri shouldBe "https://web.example.com/en/post/7"
    val (status, body) = Warc.httpBody(resp.payload)
    status shouldBe 200L
    new String(body, "UTF-8") shouldBe "hello warc body"
  }

  test("content-length-driven: payload embedding WARC/1.0\\r\\n does not split") {
    val evil = utf8("prefix WARC/1.0\r\nWARC-Type: fake\r\n\r\n suffix")
    val bytes = Warc.record(Seq("WARC-Type" -> "resource"), evil) ++
      Warc.record(Seq("WARC-Type" -> "metadata"), utf8("tail"))
    val recs = Warc.parse(bytes)
    recs.map(_.warcType) shouldBe Seq("resource", "metadata")
    recs.head.payload shouldBe evil
  }

  test("Content-Length past EOF salvages available bytes, flags truncated") {
    val bytes = Warc.warcForDoc(5L, "web", "en", "0123456789abcdef", truncateTail = 10)
    val recs = Warc.parse(bytes)
    recs.map(_.warcType) shouldBe Seq("warcinfo", "request", "response")
    val resp = recs.find(_.warcType == "response").get
    resp.truncated shouldBe true
    val (status, body) = Warc.httpBody(resp.payload)
    status shouldBe 200L
    // stream loses 10 bytes: 4 terminator CRLFs then 6 body bytes
    new String(body, "UTF-8") shouldBe "0123456789"
  }

  test("multi-member .warc.gz inflates to all records") {
    val bytes = Warc.warcForDoc(3L, "web", "fr", "corps gzip", gzipPerRecord = true)
    Warc.isGzip(bytes) shouldBe true
    val recs = Warc.parse(bytes)
    recs.map(_.warcType) shouldBe Seq("warcinfo", "request", "response")
    val (_, body) = Warc.httpBody(recs.last.payload)
    new String(body, "UTF-8") shouldBe "corps gzip"
  }

  test("truncated gzip member salvages inflated prefix instead of throwing") {
    val whole = Warc.warcForDoc(3L, "web", "en", "x" * 2000, gzipPerRecord = true)
    val cut = whole.dropRight(40) // cut inside the last member
    noException should be thrownBy Warc.parse(cut)
    val recs = Warc.parse(cut)
    recs.map(_.warcType).take(2) shouldBe Seq("warcinfo", "request")
    // the cut member either vanishes or surfaces truncated — never throws
    recs.filter(_.warcType == "response").foreach(_.truncated shouldBe true)
  }

  test("corrupt gzip tail after valid members salvages the valid prefix") {
    val ok = Warc.warcForDoc(9L, "web", "en", "good", gzipPerRecord = true)
    val recs = Warc.parse(ok ++ Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4))
    recs.map(_.warcType) shouldBe Seq("warcinfo", "request", "response")
  }

  test("garbage between records is skipped to the next magic") {
    val bytes = utf8("leading junk ") ++
      Warc.record(Seq("WARC-Type" -> "resource"), utf8("a")) ++
      utf8("mid-stream garbage without magic") ++
      Warc.record(Seq("WARC-Type" -> "metadata"), utf8("b"))
    Warc.parse(bytes).map(_.warcType) shouldBe Seq("resource", "metadata")
  }

  test("httpBody with no header terminator reports (0, empty)") {
    val (status, body) = Warc.httpBody(utf8("HTTP/1.1 200 OK\r\nCut-Off"))
    status shouldBe 0L
    body.length shouldBe 0
  }

  test("scanStream: arriving .warc.gz files parse exactly once, incrementally") {
    val dir = Files.createTempDirectory("warc-stream").toFile
    try {
      Files.write(new java.io.File(dir, "a.warc.gz").toPath,
        Warc.warcForDoc(1L, "web", "en", "first arrival", gzipPerRecord = true))
      val stream = Warc.scanStream(spark, dir.getAbsolutePath)
      stream.isStreaming shouldBe true
      val q = stream.writeStream.format("memory").queryName("warc_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val batch1 = spark.table("warc_stream").collect()
        batch1.length shouldBe 3 // one doc triple
        // a new file lands: ONLY its records appear in the next batch
        Files.write(new java.io.File(dir, "b.warc.gz").toPath,
          Warc.warcForDoc(2L, "web", "fr", "second arrival", gzipPerRecord = true) ++
            Warc.warcForDoc(3L, "web", "de", "third arrival", gzipPerRecord = true))
        q.processAllAvailable()
        val all = spark.table("warc_stream").collect()
        all.length shouldBe 9 // cumulative, no re-parse of a.warc.gz
        all.count(_.getAs[String]("warc_type") == "response") shouldBe 3
        val uris = all.filter(_.getAs[String]("warc_type") == "response")
          .map(_.getAs[String]("target_uri")).sorted
        uris shouldBe Array(
          "https://web.example.com/de/post/3",
          "https://web.example.com/en/post/1",
          "https://web.example.com/fr/post/2")
      } finally q.stop()
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("scan: one binaryFile task per .warc.gz, multi-record files, census survives") {
    val dir = Files.createTempDirectory("warc-scan").toFile
    try {
      // two files, each holding TWO documents' triples back-to-back —
      // the multi-record-per-file grain Common Crawl ships
      Files.write(new java.io.File(dir, "a.warc.gz").toPath,
        Warc.warcForDoc(1L, "web", "en", "doc one", gzipPerRecord = true) ++
          Warc.warcForDoc(2L, "web", "en", "doc two", gzipPerRecord = true))
      Files.write(new java.io.File(dir, "b.warc").toPath,
        Warc.warcForDoc(3L, "news", "fr", "doc trois") ++
          Warc.warcForDoc(4L, "news", "fr", "doc quatre", truncateTail = 10))
      val df = Warc.scan(spark, dir.getAbsolutePath + "/*.warc*")
      val rows = df.collect()
      rows.length shouldBe 12 // 4 docs x 3 records
      rows.count(_.getAs[String]("warc_type") == "response") shouldBe 4
      rows.count(_.getAs[Boolean]("truncated")) shouldBe 1
      val uris = rows.filter(_.getAs[String]("warc_type") == "response")
        .map(_.getAs[String]("target_uri")).sorted
      uris shouldBe Array(
        "https://news.example.com/fr/post/3", "https://news.example.com/fr/post/4",
        "https://web.example.com/en/post/1", "https://web.example.com/en/post/2")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}

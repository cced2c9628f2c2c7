package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.functions.VectorMeanAggregator
import graft.ref.HttpSink

class HttpSinkUdafSpec extends SparkSpec {
  import spark.implicits._

  test("toCsv: header + rows, quoting, null as empty (pandas to_csv shape)") {
    val df = Seq(("a,1", Some("x")), ("plain", None)).toDF("siret", "flag")
    val csv = HttpSink.toCsv(df.orderBy("siret"))
    csv shouldBe "siret,flag\n\"a,1\",x\nplain,\n"
  }

  test("publish: multipart POST then metadata PUT against a local server (S9)") {
    var postedBody: String = null
    var postedKey: String = null
    var putBody: String = null
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    def read(x: HttpExchange): String =
      new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    var postedTransfer: String = null
    server.createContext("/upload", (x: HttpExchange) => {
      postedBody = read(x); postedKey = x.getRequestHeaders.getFirst("X-API-KEY")
      postedTransfer = x.getRequestHeaders.getFirst("Transfer-encoding")
      x.sendResponseHeaders(200, 2); x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.createContext("/meta", (x: HttpExchange) => {
      putBody = read(x)
      x.sendResponseHeaders(200, 2); x.getResponseBody.write("ok".getBytes); x.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Seq(("123", "oui")).toDF("siret", "non_diffusible")
      val (s1, s2) = HttpSink.publish(df,
        s"http://localhost:$port/upload", s"http://localhost:$port/meta",
        apiKey = "secret", filename = "etablissements_inscrits.csv",
        titleJson = """{"title":"T"}""")
      s1 shouldBe 200
      s2 shouldBe 200
      postedKey shouldBe "secret"
      postedBody should include("filename=\"etablissements_inscrits.csv\"")
      postedBody should include("siret,non_diffusible")
      postedBody should include("123,oui")
      // the upload body is streamed, not buffered: unknown length ⇒
      // chunked transfer (the one-row-at-a-time claim holds end-to-end)
      postedTransfer shouldBe "chunked"
      putBody shouldBe """{"title":"T"}"""
    } finally server.stop(0)
  }

  test("ChunkStream: pulls chunks only as the transport drains them") {
    var produced = 0
    val chunks = Iterator.tabulate(100) { i =>
      produced += 1; s"line-$i\n".getBytes(StandardCharsets.UTF_8)
    }
    val in = new HttpSink.ChunkStream(chunks)
    val buf = new Array[Byte](7)
    in.read(buf, 0, 7) shouldBe 7
    new String(buf, StandardCharsets.UTF_8) shouldBe "line-0\n"
    produced should be <= 2 // current chunk (+1 lookahead at most), not 100
    // and the rest arrives intact
    val rest = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    rest shouldBe (1 until 100).map(i => s"line-$i\n").mkString
    in.read() shouldBe -1
  }

  test("VectorMeanAggregator: mean of known vectors, map-side mergeable") {
    val agg = new VectorMeanAggregator[(Int, Array[Float])](2, _._2)
    val out = Seq((1, Array(1f, 2f)), (1, Array(3f, 4f)), (2, Array(10f, 20f)))
      .toDS()
      .groupByKey(_._1)
      .agg(agg.toColumn.name("c"))
      .collect().toMap
    out(1).toSeq shouldBe Seq(2.0, 3.0)
    out(2).toSeq shouldBe Seq(10.0, 20.0)
  }

  test("TopKAggregator: keeps exactly k, ordered desc with id tiebreak, merge-safe") {
    val agg = new graft.functions.TopKAggregator[(Double, Long)](3, identity)
    val rows = Seq((5.0, 10L), (9.0, 2L), (9.0, 1L), (1.0, 7L), (7.0, 3L))
    // reduce in one order, and merge of two split buffers, must agree
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = rows.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    whole shouldBe Seq((9.0, 1L), (9.0, 2L), (7.0, 3L))
    merged shouldBe whole
  }

  test("VectorMeanAggregator: empty group yields zero vector, null rows skipped") {
    val agg = new VectorMeanAggregator[Array[Float]](2, identity)
    val merged = agg.merge(agg.zero, agg.reduce(agg.zero, null))
    agg.finish(merged).toSeq shouldBe Seq(0.0, 0.0)
  }
}

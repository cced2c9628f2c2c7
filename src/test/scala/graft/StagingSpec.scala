package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}

import graft.ref.Staging

class StagingSpec extends SparkSpec {

  private def makeTarGz(entries: Map[String, String]): java.nio.file.Path = {
    val p = Files.createTempFile("staging", ".tar.gz")
    val out = new TarArchiveOutputStream(new GZIPOutputStream(
      new BufferedOutputStream(new FileOutputStream(p.toFile))))
    entries.foreach { case (name, content) =>
      val e = new TarArchiveEntry(name)
      val bytes = content.getBytes("UTF-8")
      e.setSize(bytes.length)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
    p
  }

  test("fetch with a local path copies the file (reference test mode)") {
    val src = Files.createTempFile("src", ".bin")
    Files.writeString(src, "payload")
    val dest = Files.createTempFile("dest", ".bin")
    Staging.fetch(src.toString, dest)
    Files.readString(dest) shouldBe "payload"
  }

  test("extractTarGz extracts only the requested members") {
    val tar = makeTarGz(Map(
      "IC_etablissement.csv" -> "a;b;c",
      "IC_installation_classee.csv" -> "d;e",
      "unrelated.txt" -> "junk"))
    val dir = Files.createTempDirectory("extract")
    val got = Staging.extractTarGz(tar, dir,
      Set("IC_etablissement.csv", "IC_installation_classee.csv"))
    got.map(_.getFileName.toString).sorted shouldBe
      Seq("IC_etablissement.csv", "IC_installation_classee.csv")
    Files.readString(dir.resolve("IC_etablissement.csv")) shouldBe "a;b;c"
    Files.exists(dir.resolve("unrelated.txt")) shouldBe false
  }

  test("extractTarGz refuses path traversal") {
    val tar = makeTarGz(Map("../evil.csv" -> "x"))
    val dir = Files.createTempDirectory("extract2")
    an[IllegalArgumentException] should be thrownBy
      Staging.extractTarGz(tar, dir, Set("../evil.csv"))
  }

  test("staged tarball flows into the ICPE CSV scan end-to-end") {
    val tar = makeTarGz(Map(
      "IC_ref_nomenclature_ic.csv" -> "R1;2710;D;;;1;lib;A;1;0\nR2;2760;D;;;4;lib2;A;1;0"))
    val dir = Files.createTempDirectory("extract3")
    val Seq(csv) = Staging.extractTarGz(tar, dir, Set("IC_ref_nomenclature_ic.csv"))
    val df = graft.ref.Sources.icpeCsv(spark, csv.toString, graft.ref.Schemas.rubrique)
    df.count() shouldBe 2
    df.select("rubrique_ic").collect().map(_.getString(0)).sorted shouldBe Array("2710", "2760")
  }

  test("csvWithQuarantine: malformed rows quarantined, clean rows survive") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("quarantine")
    val f = dir.resolve("feed.csv")
    // row 2 has a non-numeric volume; row 4 has too many columns
    Files.writeString(f,
      "s1;alpha;10.5\ns2;beta;not_a_number\ns3;gamma;2.25\ns4;delta;3.5;EXTRA\n")
    val schema = StructType(Seq(
      StructField("code", StringType),
      StructField("name", StringType),
      StructField("volume", DoubleType)))
    val (clean, rejects) = graft.ref.Sources.csvWithQuarantine(
      spark, f.toString, schema)
    clean.select("code").collect().map(_.getString(0)).toSet shouldBe Set("s1", "s3")
    val lines = rejects.collect().map(_.getString(0))
    lines.length shouldBe 2
    lines.exists(_.contains("not_a_number")) shouldBe true
    lines.exists(_.contains("EXTRA")) shouldBe true
  }

  test("jsonlWithQuarantine: explicit schema, malformed lines quarantined with raw text") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl")
    val f = dir.resolve("dump.jsonl")
    // line 2 is truncated JSON; line 4 has a type mismatch on doc_id
    Files.writeString(f,
      """{"doc_id": 1, "text": "alpha beta"}
        |{"doc_id": 2, "text": "trunc
        |{"doc_id": 3, "text": "gamma"}
        |{"doc_id": "not_a_number", "text": "delta"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val (clean, rejects) = graft.ref.Sources.jsonlWithQuarantine(spark, f.toString, schema)
    clean.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 3L)
    val lines = rejects.collect().map(_.getString(0))
    lines.length shouldBe 2
    lines.exists(_.contains("trunc")) shouldBe true
    lines.exists(_.contains("not_a_number")) shouldBe true
  }

  test("writeCorpus: sized files per partition, accurate manifest, pruned read-back") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf0001)
    val out = Files.createTempDirectory("corpus").resolve("docs").toString
    val manifest = graft.ref.Sources
      .writeCorpus(docs, out, partitionCols = Seq("lang"),
        sortCols = Seq("doc_id"), maxRecordsPerFile = 20L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // manifest row counts must equal the source's per-lang counts
    val expected = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    manifest.view.mapValues(_._2).toMap shouldBe expected

    // maxRecordsPerFile=20 forces every partition with >20 rows to
    // split into ceil(n/20)-or-more files (tasks may add more splits,
    // never fewer) — the file-sizing knob actually engaged
    manifest.foreach { case (lang, (nFiles, nRows)) =>
      withClue(s"lang=$lang: ") {
        nFiles should be >= ((nRows + 19) / 20)
      }
    }

    // a lang-filtered read-back prunes directories at planning time:
    // the scan's partition filters carry the predicate and the row
    // count matches exactly
    val one = expected.keys.min
    val back = spark.read.parquet(out).where(col("lang") === one)
    back.count() shouldBe expected(one)
    val scan = back.queryExecution.executedPlan.toString
    scan should include regex "PartitionFilters: \\[.*lang.*\\]"
  }

  test("writeCorpus format=orc: same manifest, partition pruning AND predicate pushdown") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf0001)
    val out = Files.createTempDirectory("corpus-orc").resolve("docs").toString
    val manifest = graft.ref.Sources
      .writeCorpus(docs, out, partitionCols = Seq("lang"),
        sortCols = Seq("doc_id"), maxRecordsPerFile = 20L, format = "orc")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val expected = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    manifest shouldBe expected

    val one = expected.keys.min
    val back = spark.read.orc(out)
      .where(col("lang") === one && col("doc_id") < 50)
    back.count() shouldBe docs
      .where(col("lang") === one && col("doc_id") < 50).count()
    val scan = back.queryExecution.executedPlan.toString
    scan should include regex "PartitionFilters: \\[.*lang.*\\]"
    // the doc_id predicate reaches the ORC reader (stripe-level skipping)
    scan should include regex "PushedFilters: \\[.*doc_id.*\\]"
    an[IllegalArgumentException] should be thrownBy graft.ref.Sources
      .writeCorpus(docs, out, Seq("lang"), Seq("doc_id"), format = "csv")
  }
}

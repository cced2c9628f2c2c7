package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DSv2 tar-CSV connector: member selection, explicit-schema
  * conversion (nulls, day-first dates), and pruning pushdown. */
class TarCsvSourceSpec extends SparkSpec {

  private def makeTarGz(entries: Map[String, String]): String = {
    val p = Files.createTempFile("tarcsv", ".tar.gz")
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
    p.toString
  }

  private val schema = StructType(Seq(
    StructField("codeS3ic", StringType),
    StructField("volume", DoubleType),
    StructField("date_insp", TimestampType),
    StructField("envigueur", IntegerType)))

  private lazy val tar = makeTarGz(Map(
    "other.csv" -> "zzz;1;1/1/2000;0\n",
    "IC_etablissement.csv" ->
      ("0065.00012;12.5;3/2/2021 14:30:00;1\n" + // day-first: 3 Feb
       "0065.00013;;15/6/2020;0\n")              // empty volume → null
  ))

  private def read(entry: String = "IC_etablissement.csv") =
    spark.read.format("graft.sources.TarCsvDataSource")
      .schema(schema)
      .option("path", tar).option("entry", entry)
      .load()

  test("reads the requested member with explicit schema, nulls, day-first dates") {
    val rows = read().orderBy("codeS3ic").collect()
    rows.length shouldBe 2
    rows(0).getString(0) shouldBe "0065.00012" // leading zero survives
    rows(0).getDouble(1) shouldBe 12.5
    rows(0).getTimestamp(2).toString should startWith ("2021-02-03 14:30")
    rows(1).isNullAt(1) shouldBe true
    rows(1).getTimestamp(2).toString should startWith ("2020-06-15 00:00")
  }

  test("column pruning reaches the reader: scan outputs only projected fields") {
    val df = read().select("codeS3ic")
    df.collect().map(_.getString(0)).toSet shouldBe Set("0065.00012", "0065.00013")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    withClue(scan.toString) {
      scan.output.map(_.name) shouldBe Seq("codeS3ic")
    }
  }

  test("missing entry fails with a clear message; schema is mandatory") {
    val e = intercept[Exception] {
      read(entry = "nope.csv").collect()
    }
    e.getMessage should include ("nope.csv")
    val noSchema = intercept[Exception] {
      spark.read.format("graft.sources.TarCsvDataSource")
        .option("path", tar).option("entry", "other.csv").load()
    }
    noSchema.getMessage.toLowerCase should include ("schema")
  }
}

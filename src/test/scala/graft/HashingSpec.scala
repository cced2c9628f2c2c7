package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Hashing

/** Pins the two faces of the engine-wide md5-60 content hash to each
  * other: the codegen'd column formulation (md5 → conv, what the
  * minhash/banding SQL plans run) and the JVM loop (what the SimHash64
  * and WinnowFingerprint native expressions run) must produce identical
  * longs — that identity is also what makes the DuckDB oracle
  * (`CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`) exact.
  */
class HashingSpec extends SparkSpec {

  private val samples = Seq(
    "", "a", "hello", "hello world", "the quick brown fox",
    "héllo wörld é世界", "0", "12345678", ":", "a,b:c",
    "token-with-dashes", " leading and trailing ")

  test("JVM hash60 equals the column-side md5->conv formulation") {
    import spark.implicits._
    val viaCol = samples.toDF("s")
      .select(Hashing.h60Builtin(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val viaJvm = samples.map(s => Hashing.hash60(UTF8String.fromString(s)))
    assert(viaCol.toSeq === viaJvm)
  }

  test("native Md5Hash60 (codegen) equals the builtin md5->conv formulation, plain and seeded") {
    import spark.implicits._
    val df = samples.toDF("s")
    val plain = df.select(Hashing.h60(col("s")).as("a"),
                          Hashing.h60Builtin(col("s")).as("b")).collect()
    plain.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val seeded = df.select(
        Hashing.h60Seeded(7, col("s")).as("a"),
        Hashing.h60Builtin(concat(lit("7:"), col("s"))).as("b")).collect()
    seeded.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("h60 is non-negative and under 2^60") {
    import spark.implicits._
    val rows = samples.toDF("s")
      .select(Hashing.h60(col("s")).as("a"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60))
    }
  }

  test("graft_md5h60 and graft_winnow are callable from SQL text (GraftExtensions)") {
    val viaSql = spark.sql("SELECT graft_md5h60('hello') AS h").collect()(0).getLong(0)
    viaSql shouldBe Hashing.hash60(UTF8String.fromString("hello"))
    val fp = spark.sql("SELECT graft_winnow('abcdefghijklmnop') AS fp")
      .collect()(0).getSeq[Long](0)
    fp should not be empty
  }

  test("seeded hashes are pairwise-different functions (independence smoke)") {
    import spark.implicits._
    val rows = samples.toDF("s")
      .select(Hashing.h60Seeded(0, col("s")).as("a"),
              Hashing.h60Seeded(1, col("s")).as("b"))
      .collect()
    assert(rows.exists(r => r.getLong(0) != r.getLong(1)))
    // seed 0 must differ from the unseeded hash too (no accidental identity)
    val plain = samples.toDF("s").select(Hashing.h60(col("s")).as("p")).collect()
    assert(rows.map(_.getLong(0)).toSeq != plain.map(_.getLong(0)).toSeq)
  }
}

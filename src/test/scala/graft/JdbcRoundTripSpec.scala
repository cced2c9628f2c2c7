package graft

import java.nio.file.Files

import graft.ref.Sources

/** Live round-trip for the two JDBC reference paths (S5 scan with
  * pushed-down SQL, S8 overwrite sink) against embedded Derby — the
  * only reference code paths that previously had zero test evidence
  * (no network DB in the sandbox; Derby ships in /opt/spark/jars and
  * Spark has a built-in DerbyDialect).
  */
class JdbcRoundTripSpec extends SparkSpec {

  private lazy val dbDir = Files.createTempDirectory("graft-derby").resolve("db")
  private lazy val url = s"jdbc:derby:$dbDir;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("S8 writeJdbc + S5 jdbcQuery round-trip with pushed-down projection/filter") {
    import spark.implicits._
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0))
      .toDF("id", "name", "score")
    Sources.writeJdbc(df, url, "t_roundtrip", batchSize = 2, props = props)

    // Spark's JDBC writer quotes column names, so Derby stores them
    // case-sensitively — the pushed-down SQL must quote them too
    val back = Sources.jdbcQuery(spark, url,
      """SELECT "id", "score" FROM t_roundtrip WHERE "id" >= 2""", props = props)
    val rows = back.orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((2L, 20.25), (3L, 30.0)))
    // the pushdown really happened: only the projected columns come back
    assert(back.schema.fieldNames.map(_.toLowerCase).toSeq === Seq("id", "score"))
  }

  test("S8 overwrite replaces the table (reference if_exists='replace' semantics)") {
    import spark.implicits._
    Sources.writeJdbc(Seq((1L, "old")).toDF("id", "tag"), url, "t_replace", props = props)
    Sources.writeJdbc(Seq((7L, "new"), (8L, "new")).toDF("id", "tag"), url, "t_replace", props = props)
    val back = Sources.jdbcQuery(spark, url,
      """SELECT "id" FROM t_replace""", props = props)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq === Seq(7L, 8L))
  }

  test("pushdownSelect reproduces the reference's Postgres query text exactly") {
    import Sources.ColSpec
    // dags/publish-open-data.py:26-30 — quoted $-schema, MixedCase
    // identifiers, cast-as-date alias, array column crossing as text
    val q = Sources.pushdownSelect("default$default", "Company", Seq(
      ColSpec("siret"),
      ColSpec("createdAt", alias = "date_inscription", castTo = "date"),
      ColSpec("companyTypes"),
      ColSpec("name", alias = "nom"),
      ColSpec("verificationStatus")))
    q shouldBe "SELECT \"Company\".\"siret\", " +
      "CAST(\"Company\".\"createdAt\" AS date) AS \"date_inscription\", " +
      "\"Company\".\"companyTypes\", " +
      "\"Company\".\"name\" AS \"nom\", " +
      "\"Company\".\"verificationStatus\" " +
      "FROM \"default$default\".\"Company\""
    // embedded quotes double, never break out of the identifier
    Sources.quoteIdent("a\"b") shouldBe "\"a\"\"b\""
  }

  test("quoted mixed-case \"schema\".\"Table\" round-trips live; array-as-text " +
      "rendering feeds the reference filter") {
    import spark.implicits._
    // Derby shares ANSI quoted-identifier semantics with Postgres:
    // unquoted names fold (to UPPER here, lower in Postgres), so the
    // $-schema and MixedCase names only work if the quoting is right.
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute("CREATE SCHEMA \"default$default\"")
    catch { case e: java.sql.SQLException if e.getSQLState == "X0Y68" => () } // exists
    finally conn.close()

    val df = Seq(
      ("111", "{PRODUCER}", "VERIFIED"),
      ("222", "{PRODUCER,TRANSPORTER}", "TO_BE_VERIFIED"),
      ("333", "{PRODUCER}", "TO_BE_VERIFIED"))
      .toDF("siret", "companyTypes", "verificationStatus")
    Sources.writeJdbc(df, url,
      Sources.qualifiedTable("default$default", "Company"), props = props)

    // Derby has no unbounded `text`; the builder's textType knob is the
    // per-dialect seam (`text` for Postgres stays the default)
    val back = Sources.jdbcQuery(spark, url,
      Sources.pushdownSelect("default$default", "Company", Seq(
        // all three as text: Spark's Derby writer stores strings as
        // CLOB, which Derby can't compare to literals when Spark
        // pushes the filter back down — VARCHAR restores comparability
        Sources.ColSpec("siret", asText = true),
        Sources.ColSpec("companyTypes", asText = true),
        Sources.ColSpec("verificationStatus", asText = true)),
        textType = "VARCHAR(64)",
        correlate = true), // ANSI/Derby needs the correlation name
      props = props)
    back.schema("companyTypes").dataType.typeName shouldBe "string"

    // the text rendering drives the reference's pure-producer predicate:
    // {PRODUCER} passes unverified, the multi-type array must not
    val kept = graft.ref.PublishOpenData.filterCompanies(back)
      .select("siret").as[String].collect().sorted
    kept.toSeq shouldBe Seq("111", "333")
  }
}

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
}

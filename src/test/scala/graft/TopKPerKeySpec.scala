package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** The whole-operator TopKPerKey extension: content parity with the
  * ranking window, the partial→shuffle→final plan shape, and the
  * bounded shuffle it exists for. */
class TopKPerKeySpec extends SparkSpec {

  test("topK equals the row_number window under a total order") {
    val o = Tables.orders(spark, sf0001)
    val got = TopKPerKey.topK(o, Seq("o_custkey"),
        Seq(o("o_totalprice").desc, o("o_orderkey").asc), k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = o.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    got shouldBe expected
    got should not be empty
  }

  test("plans as partial + final execs with exactly one exchange between them") {
    val o = Tables.orders(spark, sf0001)
    val df = TopKPerKey.topK(o, Seq("o_custkey"), Seq(o("o_totalprice").desc), 3)
    // strategy output: final(partial=false) directly over
    // partial(partial=true)
    val strategic = df.queryExecution.sparkPlan.toString
    withClue(strategic) {
      "TopKPerKey \\[".r.findAllIn(strategic).size shouldBe 2
    }
    // after EnsureRequirements: the one shuffle sits BETWEEN the two —
    // the aggregate-like map-side-reduction shape
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) {
      "Exchange hashpartitioning".r.findAllIn(plan).size should be >= 1
      val fin = plan.indexOf(", 3, false")
      val ex = plan.indexOf("Exchange")
      val part = plan.indexOf(", 3, true")
      withClue(s"fin=$fin ex=$ex part=$part") {
        (fin >= 0 && fin < ex && ex < part) shouldBe true
      }
    }
  }

  test("map-side partial bounds what crosses the shuffle to k rows per key per partition") {
    import spark.implicits._
    // one hot key across 4 input partitions, 1000 rows each
    val df = spark.range(0, 4000, 1, 4)
      .select(lit(1L).as("key"), col("id").as("v"))
    val top = TopKPerKey.topK(df, Seq("key"), Seq(df("v").asc), k = 5)
    top.as[(Long, Long)].collect().toSet shouldBe
      (0L until 5L).map(v => (1L, v)).toSet
    // partial output ≤ k · partitions — measured via the partial
    // exec's RDD (its compute is what feeds the exchange)
    val partialRows = top.queryExecution.sparkPlan
      .collectFirst {
        case e: graft.plans.TopKPerKeyExec if e.partial => e
      }.get.execute().count()
    partialRows should be <= (5L * 4)
  }

  test("ties beyond the total order: k rows kept, all from the tied set") {
    import spark.implicits._
    val df = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 10L, "c"), (1L, 20L, "d"))
      .toDF("key", "score", "tag")
    val kept = TopKPerKey.topK(df, Seq("key"), Seq(df("score").asc), k = 2)
      .select("score").collect().map(_.getLong(0)).toSeq.sorted
    kept shouldBe Seq(10L, 10L) // which tagged rows is unspecified; scores aren't
  }

  test("k larger than any group: every row survives") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("key", "v")
    TopKPerKey.topK(df, Seq("key"), Seq(df("v").asc), k = 10)
      .as[(Long, Long)].collect().toSet shouldBe Set((1L, 1L), (1L, 2L), (2L, 3L))
  }

  test("empty input: empty output, no failure") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("key", "v")
    TopKPerKey.topK(df, Seq("key"), Seq(df("v").asc), k = 3).count() shouldBe 0
  }
}

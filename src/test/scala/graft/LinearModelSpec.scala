package graft

import org.apache.spark.sql.functions._

import graft.ops.LinearModel

/** Contracts for the distributed logistic fit + serving-margin pair:
  * the fit learns (separable toy → perfect in-sample decision), is
  * deterministic (full-batch, no RNG), and the serving margin is the
  * exact left-associated tree the SQL oracle parses (q112).
  */
class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  /** Separable 1-D toy: y = x > 0, margins at ±0.5. */
  private lazy val toy = (-20 to 20).filter(_ != 0)
    .map(i => (Array(i / 10.0), if (i > 0) 1 else 0))
    .toDF("x", "y")

  test("fitLogistic separates a separable toy set") {
    val w = LinearModel.fitLogistic(toy, col("x"), col("y"), dim = 1,
      iters = 80, lr = 4.0)
    w should have length 2
    all(w.map(_.isFinite)) shouldBe true
    val scored = toy.select(col("y"),
      (LinearModel.margin(w.toSeq, Seq(element_at(col("x"), 1))) > 0)
        .cast("int").as("pred"))
    scored.where(col("y") =!= col("pred")).count() shouldBe 0L
  }

  test("fitLogistic is deterministic: same data, same weights") {
    val w1 = LinearModel.fitLogistic(toy, col("x"), col("y"), 1, iters = 10)
    val w2 = LinearModel.fitLogistic(toy.repartition(7), col("x"), col("y"), 1,
      iters = 10)
    // full-batch gradient = exact sum; repartitioning must not change it
    // beyond double-sum reassociation, which the toy's tiny magnitudes
    // keep at exactly-equal here
    w1.zip(w2).foreach { case (a, b) => a shouldBe b +- 1e-12 }
  }

  test("fit reduces log-loss over iterations") {
    def loss(w: Array[Double]): Double = {
      val z = LinearModel.margin(w.toSeq, Seq(element_at(col("x"), 1)))
      toy.select(avg(log(lit(1.0) + exp(-z * (col("y") * 2 - 1)))))
        .head().getDouble(0)
    }
    val w0 = Array(0.0, 0.0)
    val w5 = LinearModel.fitLogistic(toy, col("x"), col("y"), 1, iters = 5)
    val w40 = LinearModel.fitLogistic(toy, col("x"), col("y"), 1, iters = 40)
    loss(w5) should be < loss(w0)
    loss(w40) should be < loss(w5)
  }

  test("margin builds the left-associated tree the SQL parse produces") {
    val df = Seq((2.0, 3.0)).toDF("a", "b")
    val viaOp = df.select(LinearModel.margin(Seq(0.5, 1.5, -2.5),
      Seq(col("a"), col("b"))).as("m"))
    val viaSql = df.selectExpr("0.5d + 1.5d * a + -2.5d * b AS m")
    viaOp.head().getDouble(0) shouldBe viaSql.head().getDouble(0)
    viaOp.head().getDouble(0) shouldBe (0.5 + 1.5 * 2.0 + -2.5 * 3.0)
  }

  test("q112's pinned weights yield a non-trivial split on the fixture") {
    val out = SparkEntry.queries("q112_quality_classifier")(spark, sf0001)
    val byKeep = out.groupBy("keep").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    byKeep.keySet shouldBe Set(true, false) // a gate that can't fail proves nothing
  }
}

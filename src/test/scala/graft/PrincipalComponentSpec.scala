package graft

import org.apache.spark.sql.functions._

import graft.sim.PrincipalComponent

/** Contracts for the dominant-direction operator: exact agreement of
  * the pinned distributed path with a driver reference that mirrors its
  * documented fold orders, unit-norm output, and direction agreement
  * between the pinned path and the one-pass Gram path (which trades
  * bit-pinning for 100 TB shape).
  */
class PrincipalComponentSpec extends SparkSpec {
  import spark.implicits._

  private def toDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  /** Driver mirror of topComponent's exact fold orders. */
  private def reference(rows: Seq[(Long, Seq[Float])], iters: Int): Array[Double] = {
    val byId = rows.sortBy(_._1)
    val d = byId.head._2.length
    val n = byId.size.toDouble
    // per-dim mean, vec_id-ordered fold from 0.0
    val mu = Array.tabulate(d) { j =>
      byId.foldLeft(0.0)((acc, r) => acc + r._2(j).toDouble) / n
    }
    val xc = byId.map { case (id, e) =>
      id -> Array.tabulate(d)(j => e(j).toDouble - mu(j))
    }
    var v = Array.fill(d)(1.0)
    for (_ <- 0 until iters) {
      // c_i: in-row fold in dimension order from 0.0
      val c = xc.map { case (id, e) =>
        id -> (0 until d).foldLeft(0.0)((acc, j) => acc + e(j) * v(j))
      }.toMap
      // y_j: vec_id-ordered fold from 0.0
      val y = Array.tabulate(d) { j =>
        xc.foldLeft(0.0) { case (acc, (id, e)) => acc + e(j) * c(id) }
      }
      val nrm = math.sqrt(y.foldLeft(0.0)((acc, t) => acc + t * t))
      v = y.map(_ / nrm)
    }
    v
  }

  private val crafted: Seq[(Long, Seq[Float])] = {
    // spiked covariance: dominant direction ~ (3, -1, 2)/norm + noise
    val u = Seq(3.0f, -1.0f, 2.0f)
    val rnd = new scala.util.Random(7)
    (0L until 40L).map { i =>
      val a = (rnd.nextDouble() * 4 - 2).toFloat
      i -> u.map(t => t * a + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
    }
  }

  test("topComponent agrees EXACTLY with the fold-order driver reference") {
    val got = PrincipalComponent.topComponent(toDf(crafted), iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    spark.sharedState.cacheManager.clearCache()
    val want = reference(crafted, iters = 3)
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) => g shouldBe w } // exact doubles
  }

  test("topComponent output is unit-L2 and aligned with the planted spike") {
    val got = PrincipalComponent.topComponent(toDf(crafted), iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    spark.sharedState.cacheManager.clearCache()
    math.abs(got.map(t => t * t).sum - 1.0) should be < 1e-12
    val u = Array(3.0, -1.0, 2.0)
    val un = math.sqrt(u.map(t => t * t).sum)
    val cos = got.zip(u).map { case (a, b) => a * b / un }.sum
    math.abs(cos) should be > 0.99
  }

  test("Gram path agrees with the pinned path in direction") {
    val pinned = PrincipalComponent.topComponent(toDf(crafted), iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    spark.sharedState.cacheManager.clearCache()
    val gram = PrincipalComponent.topComponentGram(spark, toDf(crafted), iters = 10)
    val cos = pinned.zip(gram).map { case (a, b) => a * b }.sum
    math.abs(cos) should be > 0.98
  }
}

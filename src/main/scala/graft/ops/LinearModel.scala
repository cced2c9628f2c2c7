package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-model training in the `IvfIndex.fit` discipline:
  * the DATA never leaves the cluster, the MODEL never leaves the
  * driver. Each iteration is ONE aggregate job computing the full
  * batch gradient — dim+1 partial sums, map-side combined, so the
  * shuffle per iteration is dim+1 doubles per partition regardless of
  * corpus size. At 100 TB the cost is the scan (times a fixed, small
  * iteration count); callers should `persist` the projected feature
  * frame if iterating more than a handful of times.
  *
  * The intended use is the fastText-style corpus-quality classifier: a
  * handful of cheap heuristic features (token count, stopword ratio,
  * repetition…) fitted against a small labeled sample, then applied
  * corpus-wide as a pure projection (see q112, which pins the fitted
  * weights as literals — the model rides the PLAN, not the cluster).
  * Features are expected pre-scaled to O(1); the caller owns
  * normalization so that the serving-side expression can reproduce it
  * exactly (q112 uses /256, an exact binary scale).
  *
  * The sigmoid (libm `exp`) lives only HERE, in the fit: serving emits
  * the linear margin, whose IEEE double arithmetic is bit-reproducible
  * across engines, while `exp` is libm-dependent and would break exact
  * cross-engine oracles.
  */
object LinearModel {

  /** Full-batch gradient-descent logistic regression.
    *
    * @param df       training rows
    * @param features `array<double>` column of length `dim`
    * @param label    0/1 (or boolean) label column
    * @param dim      feature count (without bias)
    * @param iters    fixed pass count (each = one aggregate job)
    * @param lr       learning rate on the MEAN gradient
    * @return weights of length dim+1: index 0 is the bias
    */
  def fitLogistic(df: DataFrame, features: Column, label: Column, dim: Int,
                  iters: Int = 50, lr: Double = 2.0): Array[Double] = {
    require(dim > 0 && iters > 0)
    val data = df.select(features.as("x"), label.cast("double").as("y"))
    val n = data.count().toDouble
    require(n > 0, "empty training frame")
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val z = (1 to dim).foldLeft(lit(w(0)): Column) { (acc, j) =>
        acc + lit(w(j)) * element_at(col("x"), j)
      }
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - col("y")
      val grads = sum(err).as("g0") +:
        (1 to dim).map(j => sum(err * element_at(col("x"), j)).as(s"g$j"))
      val row = data.agg(grads.head, grads.tail: _*).head()
      for (j <- 0 to dim) w(j) -= lr * row.getDouble(j) / n
    }
    w
  }

  /** Linear margin w·(1 +: xs) as a LEFT-ASSOCIATED expression tree:
    * `w0 + w1*x1 + w2*x2 + …`. Serving-side complement of
    * [[fitLogistic]] — same tree shape an ANSI SQL engine parses for
    * the equivalent infix expression, so per-row doubles match
    * bit-for-bit cross-engine (decision = margin > 0). */
  def margin(weights: Seq[Double], xs: Seq[Column]): Column = {
    require(weights.length == xs.length + 1,
      s"need ${xs.length + 1} weights (bias first), got ${weights.length}")
    xs.zip(weights.tail).foldLeft(lit(weights.head): Column) {
      case (acc, (x, wj)) => acc + lit(wj) * x
    }
  }
}

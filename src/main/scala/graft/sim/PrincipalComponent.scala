package graft.sim

import graft.ops.TrackedCache.TrackOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dominant principal direction of an embedding corpus — the vector the
  * "all-but-the-top" embedding post-process removes (dominant-direction
  * debiasing), the first axis of a PCA whitening, and the 1-D
  * projection a curation pipeline uses to spot batch effects between
  * sources. Computed by power iteration on the (optionally centered)
  * Gram operator: v ← normalize( Xᵀ(Xv) ).
  *
  * Two paths, one semantics:
  *
  *  - [[topComponent]] — fully distributed and BIT-REPRODUCIBLE: each
  *    iteration is (a) one narrow pass computing cᵢ = xᵢ·v in-row
  *    (left-to-right fold over dimensions, the engine-wide cosine
  *    convention), then (b) one exchange keyed by dimension whose
  *    per-dim sum Σᵢ cᵢ·xᵢ[d] is an ORDERED fold by vec_id (the
  *    pageRank/q117 convention), so a SQL oracle reproduces every
  *    double exactly. The ordered fold materializes one N-row struct
  *    array per dimension — the price of exactness; fine to ~10⁷ rows
  *    per dim group, beyond which use the Gram path.
  *  - [[topComponentGram]] — the 100 TB path: ONE pass over the data
  *    accumulates the d×d Gram matrix map-side (d² floats per
  *    partition, combine-merged), then the power iteration runs on the
  *    driver over d² doubles (8 MB at d=1024) — no per-iteration scan,
  *    no N-sized groups, float-sum order unpinned (reproducible only
  *    up to summation order, like any production BLAS reduction).
  *
  * Both center by subtracting the per-dimension mean when `center`
  * (the PCA convention; ABTT requires it).
  */
object PrincipalComponent {

  private def orderedFold(pairs: org.apache.spark.sql.Column) =
    aggregate(array_sort(pairs), lit(0.0), (a, x) => a + x.getField("v"))

  /** Center `(vec_id, e: array<double>)` by the per-dim ordered-fold mean. */
  private def centered(x0: DataFrame): DataFrame = {
    val mudim = x0
      .select(col("vec_id"), posexplode(col("e")).as(Seq("pos", "xv")))
      .groupBy("pos")
      .agg((orderedFold(collect_list(struct(col("vec_id"), col("xv").as("v")))) /
        count(lit(1)).cast("double")).as("m"))
    val mu = mudim.agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(transform(col("pm"), s => s.getField("m")).as("mu"))
    x0.crossJoin(broadcast(mu))
      .select(col("vec_id"), zip_with(col("e"), col("mu"), (a, b) => a - b).as("e"))
  }

  /** (dim, loading) of the unit-L2 dominant direction after `iters`
    * power-iteration steps from the all-ones start vector. Every double
    * is deterministic cross-engine (ordered folds throughout). */
  def topComponent(emb: DataFrame, iters: Int = 3,
                   center: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val x0 = emb.select(col("vec_id"),
      transform(col("embedding"), v => v.cast("double")).as("e"))
    val xc = (if (center) centered(x0) else x0).persistT
    var v = xc.limit(1).select(transform(col("e"), _ => lit(1.0)).as("v"))
    for (_ <- 0 until iters) {
      val c = xc.crossJoin(broadcast(v))
        .select(col("vec_id"), col("e"),
          aggregate(zip_with(col("e"), col("v"), (a, b) => a * b),
            lit(0.0), (s, t) => s + t).as("c"))
      val ydim = c
        .select(col("vec_id"), col("c"), posexplode(col("e")).as(Seq("pos", "xv")))
        .groupBy("pos")
        .agg(orderedFold(collect_list(
          struct(col("vec_id"), (col("xv") * col("c")).as("v")))).as("y"))
      v = ydim.agg(array_sort(collect_list(struct(col("pos"), col("y")))).as("py"))
        .select(transform(col("py"), s => s.getField("y")).as("y"))
        .select(col("y"),
          sqrt(aggregate(transform(col("y"), t => t * t),
            lit(0.0), (a, b) => a + b)).as("nrm"))
        .select(transform(col("y"), t => t / col("nrm")).as("v"))
    }
    val out = v.select(posexplode(col("v")).as(Seq("dim", "loading"))).persistT
    out.count()
    xc.unpersist(blocking = false)
    out
  }

  /** Driver-held dominant direction via a single distributed Gram-matrix
    * pass (map-side combined d×d upper triangle) + driver power
    * iteration. Scale path: one scan total, O(d²) driver state. */
  def topComponentGram(spark: SparkSession, emb: DataFrame, iters: Int = 10,
                       center: Boolean = true): Array[Double] = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val x0 = emb.select(transform(col("embedding"), v => v.cast("double")).as("e"))
    val xc = if (center) {
      // plain (unpinned) mean is fine here: this path trades bit-pinning
      // for one-pass scale, and the mean rides the same trade
      val mu = x0.select(posexplode(col("e")).as(Seq("pos", "xv")))
        .groupBy("pos").agg(avg(col("xv")).as("m"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(transform(col("pm"), s => s.getField("m")).as("mu"))
      x0.crossJoin(broadcast(mu))
        .select(zip_with(col("e"), col("mu"), (a, b) => a - b).as("e"))
    } else x0
    // d² accumulator per partition, merged pairwise — one job, no shuffle
    // of row-sized data (the TreeAggregate shape Spark MLlib uses)
    val gram = xc.select(col("e")).rdd
      .mapPartitions { it =>
        var acc: Array[Double] = null
        var d = 0
        it.foreach { row =>
          val e = row.getSeq[Double](0)
          if (acc == null) { d = e.length; acc = new Array[Double](d * d) }
          var i = 0
          while (i < d) {
            val ei = e(i); var j = i
            while (j < d) { acc(i * d + j) += ei * e(j); j += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty else Iterator((d, acc))
      }
      .reduce { case ((d, a), (_, b)) =>
        var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; (d, a)
      }
    val (d, g) = gram
    // mirror the upper triangle
    var i = 0
    while (i < d) { var j = 0; while (j < i) { g(i * d + j) = g(j * d + i); j += 1 }; i += 1 }
    var v = Array.fill(d)(1.0)
    for (_ <- 0 until iters) {
      val y = new Array[Double](d)
      var r = 0
      while (r < d) {
        var s = 0.0; var c = 0
        while (c < d) { s += g(r * d + c) * v(c); c += 1 }
        y(r) = s; r += 1
      }
      val nrm = math.sqrt(y.map(t => t * t).sum)
      v = y.map(_ / nrm)
    }
    v
  }
}

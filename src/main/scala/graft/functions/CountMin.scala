package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min sketch heavy hitters — the frequency member of the sketch
  * family next to HLL distinct counting (q46/q55): one pass builds a
  * mergeable CMS over the item stream (Spark's `count_min_sketch`
  * aggregate — per-partition sketches, map-side combined, constant
  * memory), and the estimate contract `exact ≤ est ≤ exact + ε·N`
  * is asserted per reported key.
  *
  * Scale shape: the sketch pass is the whole point at 100 TB — the
  * aggregate ships ~(depth·width) counters per partition instead of a
  * per-key hash map, so frequency estimation over a billion-key stream
  * costs constant memory. The exact top-k here is the verification
  * twin (a second pass, map-side combined); a production caller keeps
  * only the sketch and probes candidate keys.
  */
object CountMin {

  /** Exact top-`k` values of `keyCol` (count desc, key asc) with the
    * CMS estimate and its two-sided contract booleans.
    *
    * The key is sketched AND estimated through its canonical string
    * rendering, so a non-string key column (e.g. a bigint user id)
    * works — previously the estimate UDF was typed String and threw a
    * cast error on integral keys the CMS aggregate itself accepts
    * (ADVICE r3 #3). Both sides of the contract use the same
    * rendering, so the `exact ≤ est ≤ exact + ε·N` bounds still hold
    * key for key. */
  def heavyHitters(items: DataFrame, keyCol: String, k: Int,
                   eps: Double = 1e-4, confidence: Double = 0.999): DataFrame = {
    val skBytes = items
      .agg(expr(s"count_min_sketch(CAST($keyCol AS STRING), CAST($eps AS DOUBLE), CAST($confidence AS DOUBLE), 1)"))
      .head().getAs[Array[Byte]](0)
    val n = CountMinSketch.readFrom(new ByteArrayInputStream(skBytes)).totalCount()
    val slack = math.ceil(eps * n).toLong
    val bc = items.sparkSession.sparkContext.broadcast(skBytes)
    // deserialize per evaluated row — only the k winners reach the UDF
    val est = udf { key: String =>
      CountMinSketch.readFrom(new ByteArrayInputStream(bc.value)).estimateCount(key)
    }
    items.groupBy(keyCol).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col(keyCol))
      .limit(k)
      .withColumn("__est", est(col(keyCol).cast("string")))
      .select(col(keyCol), col("exact_n"),
        (col("__est") >= col("exact_n")).as("est_at_least_exact"),
        (col("__est") <= col("exact_n") + lit(slack)).as("est_within_eps"))
  }
}

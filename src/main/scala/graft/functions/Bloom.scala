package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership pre-filtering over long keys — the runtime-
  * filter primitive Spark itself injects between shuffle-join sides
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
  * explicit operator for the places the optimizer can't reach: a
  * filter built ONCE and reused across many queries, a stream-static
  * path, or a build side produced outside the current plan.
  *
  * The fit is one distributed aggregate (per-partition blooms OR-merged
  * on the driver — a gated edge collect of a fixed-size bitset, the
  * q46/q55 sketch discipline); the probe is a foldable binary literal
  * inside whole-stage codegen, so it composes with scan pushdown and
  * costs one hash per row. Sizing: ~9.6 bits/item at fpp=1% — an eval-
  * suite gram set of 10M hashes is a 12 MB broadcast.
  */
object Bloom {

  /** Build a bloom filter over a BIGINT column in one pass. */
  def fit(df: DataFrame, col: String, expectedItems: Long,
          fpp: Double = 0.01): Array[Byte] = {
    val bf = df.stat.bloomFilter(col, math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Probe column: true if `value` MIGHT be in the fitted filter
    * (false positives at ~fpp; never false negatives — callers needing
    * exactness follow with an exact verify on the survivors). */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      GraftSqlShim.expression(lit(bloom)), GraftSqlShim.expression(value)))

  /** Deserialize for driver-side point checks (specs, debugging). */
  def read(bloom: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloom))
}

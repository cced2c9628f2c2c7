package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Hashing

/** Deterministic sampling for reproducible training-data pipelines.
  *
  * `df.sample()` rides `rand()`, whose draw per row depends on the
  * partitioning and evaluation order — re-running on a different
  * cluster layout samples a DIFFERENT subset, which poisons dataset
  * versioning and makes the sample un-oracle-able. Hash sampling keys
  * the decision on the ROW (md5-60 of its key), so the same row is
  * always in or out: stable under repartitioning, joins, retries, and
  * engine swaps — and exactly reproducible in the DuckDB oracle.
  * Both shapes are narrow (a filter / a per-group top-k); nothing
  * shuffles beyond what the stratified top-k inherently needs.
  */
object Sampling {

  private val HashSpace = (1L << 60).toDouble

  /** Keep rows whose key hash lands in the lowest `fraction` of the
    * 60-bit hash space — an unbiased, partitioning-independent
    * Bernoulli(fraction) sample keyed on `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(Hashing.h60(key.cast("string")) < lit((fraction * HashSpace).toLong))
  }

  /** Stratified deterministic sample: the `k` smallest key hashes per
    * stratum — uniform within each stratum, exactly `min(k, |stratum|)`
    * rows out, same rows on any partitioning. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(Hashing.h60(key.cast("string")), key.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}

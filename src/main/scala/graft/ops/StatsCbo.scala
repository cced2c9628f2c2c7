package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A COST-MODEL consumer of the standing [[StatsIndex]] (VERDICT r15
  * #10, second candidate, seeded): join-strategy planning that reads
  * the index's statistics instead of scanning data. The decision —
  * broadcast which side, if any — is the arithmetic Spark's own CBO
  * runs on fresh ANALYZE stats, but served from the incrementally
  * maintained index, so it stays correct under appends AND retractions
  * without ever re-running ANALYZE. Neither side is scanned until the
  * join itself executes; the pick is applied as a broadcast hint, so
  * Catalyst still owns the physical plan.
  *
  * Width model: the caller supplies per-row byte widths (the q264
  * convention — fixed numeric widths + expected string lengths);
  * row counts come from the index (exact tier: Σ cnt over the key's
  * value grain; sketch tier: the summable `sk:n:` row — so even a
  * high-NDV key column prices its side exactly).
  *
  * 100 TB shape: the decision reads two tiny aggregates over value
  * frames (cost ∝ NDV, or O(1) for sketch-tier keys) — the planner
  * never touches the fact tables. StatsIndexSpec pins that the pick
  * actually lands in the physical plan (BroadcastHashJoin vs
  * SortMergeJoin) and flips with the threshold.
  */
object StatsCbo {

  /** Rows the index holds for `statKey` — exact tier first, sketch
    * tier's n row otherwise (a key lives in exactly one tier). */
  def rowCount(spark: SparkSession, name: String, statKey: String): Long = {
    val exact = StatsIndex.liveValues(spark, name)
      .where(col("stat_key") === statKey)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n")).head().getLong(0)
    if (exact > 0L) exact
    else {
      val sk = StatsIndex.sketchStats(spark, name)
        .where(col("stat_key") === statKey)
        .agg(coalesce(sum(col("n")), lit(0L)).as("n")).head()
      sk.getLong(0)
    }
  }

  case class SideStats(rows: Long, bytes: Long)

  def sideStats(spark: SparkSession, name: String, statKey: String,
                rowBytes: Long): SideStats = {
    val n = rowCount(spark, name, statKey)
    SideStats(n, n * rowBytes)
  }

  /** The pick: broadcast the smaller under-threshold side (ties to b,
    * the conventional dimension side); no side under threshold → let
    * the join shuffle. Pure integer arithmetic — bit-reproducible. */
  case class Decision(a: SideStats, b: SideStats,
                      thresholdBytes: Long = 10485760L) {
    val broadcastB: Boolean = b.bytes <= thresholdBytes && b.bytes <= a.bytes
    val broadcastA: Boolean = !broadcastB && a.bytes <= thresholdBytes
  }

  /** Apply the decision as a hint; Catalyst plans the join. */
  def join(a: DataFrame, b: DataFrame, on: Seq[String], d: Decision,
           joinType: String = "inner"): DataFrame =
    if (d.broadcastB) a.join(broadcast(b), on, joinType)
    else if (d.broadcastA) broadcast(a).join(b, on, joinType)
    else a.join(b, on, joinType)
}

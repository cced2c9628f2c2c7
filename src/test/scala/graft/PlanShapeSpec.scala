package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.SparkEntry

/** Physical-plan contracts for the scale posture the operators claim —
  * these are the properties that decide whether a plan survives 100 TB,
  * asserted so they cannot silently regress:
  *   - filters/projections reach the parquet scan (PushedFilters /
  *     ReadSchema), so a 2-column projection never reads all columns;
  *   - small dimensions broadcast (no shuffle join for region/nation);
  *   - IVF cell assignment is a narrow projection — NO Exchange between
  *     the corpus scan and the search join (the round-1 plan shuffled
  *     |corpus|·nCells rows here).
  */
class PlanShapeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("q02 filter/projection push down to the parquet scan") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf0001)
    val scan = planString(df)
    scan should include("PushedFilters")
    // the pushed filter set must be non-empty (prefix filter reaches the scan)
    scan should include regex "PushedFilters: \\[.*(StringStartsWith|IsNotNull).*\\]"
    // column pruning: lineitem is ~16 columns; the read schema must not be all of them
    val readSchemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(scan).map(_.group(1)).toSeq
    readSchemas should not be empty
    all(readSchemas.map(_.split(",").length)) should be <= 8
  }

  test("q22 star join broadcasts every dimension (no shuffle join on dims)") {
    val df = SparkEntry.queries("q22_star_join_revenue")(spark, sf0001)
    df.collect() // AQE finalizes the adaptive plan
    val plan = planString(df)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q47 IVF corpus assignment is narrow: no Exchange below the search join's corpus side") {
    val df = SparkEntry.queries("q47_ann_ivf_topk")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // find the broadcast hash join; its STREAMED (corpus) side must
    // contain no Exchange — scan → filter → project(cell) → join
    val bhj = collectFirst(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    bhj should be (defined)
    val streamed = bhj.get.left // BuildRight: left is the streamed corpus side
    val exchangesBelow = collect(streamed) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    exchangesBelow shouldBe empty
  }

  test("q23 exact-dedup aggregation has map-side partial aggregation (two HashAggregates)") {
    val df = SparkEntry.queries("q23_dedup_exact")(spark, sf0001)
    df.collect()
    val plan = planString(df)
    // partial + final pairs: the shuffle carries combined partials,
    // not raw rows
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }
}

package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: when both sides are bucketed (and
  * sorted) on the join key with the same bucket count, the sort-merge
  * join runs with NO shuffle exchange — the pre-partitioning of a
  * repeatedly-joined 100 TB fact table is paid once at write time
  * instead of per query.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two co-bucketed tables plans without a shuffle exchange") {
    val orders = Tables.load(spark, sf0001, "orders")
    val lineitem = Tables.load(spark, sf0001, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    // correctness: same row count as the plain-parquet join
    joined.count() shouldBe
      lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey")).count()
    // the join itself must not introduce a shuffle: bucketed scan-to-
    // join path has no "Exchange hashpartitioning" above either scan
    withClue(plan) {
      plan.contains("Exchange hashpartitioning") shouldBe false
    }
  }
}

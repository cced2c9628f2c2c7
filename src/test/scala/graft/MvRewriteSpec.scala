package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ops.MvIndex

/** Transparent MV rewrite ([[graft.plans.RewriteMvAggregate]]): a plain
  * aggregate over a scan with a registered lockstep view serves from
  * the view under the gate — results bit-identical, coarser GROUP BYs
  * roll up, and the negative space (gate off, filters, foreign
  * measures, DISTINCT) always still scans the fact table. Fail closed
  * is the contract: this rule changes WHICH DATA a plan reads, so any
  * unmatched shape must be left alone.
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def scansPath(df: DataFrame, fragment: String): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] &&
        lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.exists(_.toString.contains(fragment)) => lr
    }.isDefined

  private def gated[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.mvRewrite", on.toString)
    try body finally spark.conf.set("spark.graft.mvRewrite", "false")
  }

  // a source dir this suite owns, so the lockstep test can grow it
  private lazy val srcDir = {
    val dir = java.nio.file.Files.createTempDirectory("mvrw-src").toString
    (1 to 30).map(i => (s"k${i % 3}", s"s${i % 2}", i * 0.25))
      .toDF("k", "s2", "v").write.mode("append").parquet(dir)
    dir
  }

  private def buildView(): Unit =
    if (!spark.catalog.tableExists("mvrw_view_mv")) {
      MvIndex.writeFromSource(spark, srcDir, "mvrw_view",
        keys = Seq("k", "s2"),
        measures = Seq("sv" -> "CAST(v AS DECIMAL(18,4))"))
    }

  private def plainAgg(keys: String*): DataFrame =
    spark.read.parquet(srcDir)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(v AS DECIMAL(18,4))")).as("sv"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(df.columns.map(col): _*).collect()
      .map(_.toSeq.map { case d: java.math.BigDecimal => d.doubleValue(); case x => x })
      .toSeq

  test("gate off scans the fact; gate on serves the view with identical results") {
    buildView()
    val off = gated(on = false) { (scansPath(plainAgg("k", "s2"), "mvrw-src"), rows(plainAgg("k", "s2"))) }
    off._1 shouldBe true
    gated(on = true) {
      val agg = plainAgg("k", "s2")
      scansPath(agg, "mvrw-src") shouldBe false
      rows(agg) shouldBe off._2
    }
  }

  test("coarser GROUP BY (and the global aggregate) roll up through the rewrite") {
    buildView()
    val want1 = gated(on = false)(rows(plainAgg("k")))
    val want0 = gated(on = false)(rows(plainAgg()))
    gated(on = true) {
      val agg1 = plainAgg("k")
      scansPath(agg1, "mvrw-src") shouldBe false
      rows(agg1) shouldBe want1
      val agg0 = plainAgg()
      scansPath(agg0, "mvrw-src") shouldBe false
      rows(agg0) shouldBe want0
    }
  }

  test("negative space: filter, foreign measure, DISTINCT, foreign key column never rewrite") {
    buildView()
    gated(on = true) {
      // a filtered aggregate is NOT the view's content
      scansPath(spark.read.parquet(srcDir).where(col("v") > 3)
        .groupBy("k").agg(count(lit(1)).as("n")), "mvrw-src") shouldBe true
      // a measure expression the view doesn't record
      scansPath(spark.read.parquet(srcDir)
        .groupBy("k").agg(sum(expr("CAST(v AS DECIMAL(10,2))")).as("x")), "mvrw-src") shouldBe true
      // DISTINCT aggregates have no partial in the view
      scansPath(spark.read.parquet(srcDir)
        .groupBy("k").agg(countDistinct(col("v")).as("x")), "mvrw-src") shouldBe true
      // grouping by a column outside the view's keys
      scansPath(spark.read.parquet(srcDir)
        .groupBy("v").agg(count(lit(1)).as("n")), "mvrw-src") shouldBe true
      // an aggregate the view cannot serve (avg is not recorded; only
      // count/sum partials match)
      scansPath(spark.read.parquet(srcDir)
        .groupBy("k").agg(avg(col("v")).as("x")), "mvrw-src") shouldBe true
    }
  }

  test("collapsed projections and avg-shaped expressions rewrite through the calls") {
    buildView()
    // the shape that actually reaches the optimizer from
    // `.agg(...).select(cast(...))`: CollapseProject folds the final
    // projection INTO the aggregate list, so the sum sits under a cast
    // (the q312 regression — bare-agg-only matching missed it)
    def collapsed(): DataFrame = spark.read.parquet(srcDir)
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(v AS DECIMAL(18,4))")).as("sv"))
      .select(col("k"), col("n"), col("sv").cast("double").as("sv_d"))
    // avg written as sum/count — both partials exist in the view
    def avgShaped(): DataFrame = spark.read.parquet(srcDir)
      .groupBy("k")
      .agg((sum(expr("CAST(v AS DECIMAL(18,4))")).cast("double") /
        count(lit(1)).cast("double")).as("avg_v"))
    val wantC = gated(on = false)(rows(collapsed()))
    val wantA = gated(on = false)(rows(avgShaped()))
    gated(on = true) {
      scansPath(collapsed(), "mvrw-src") shouldBe false
      rows(collapsed()) shouldBe wantC
      scansPath(avgShaped(), "mvrw-src") shouldBe false
      rows(avgShaped()) shouldBe wantA
      // avg() proper has no partial in the view — must still scan
      scansPath(spark.read.parquet(srcDir)
        .groupBy("k").agg(avg(col("v")).as("x")), "mvrw-src") shouldBe true
      // sum over a DOUBLE measure is order-dependent — never substituted
      // by the exact-decimal refold even if someone records it
      scansPath(spark.read.parquet(srcDir)
        .groupBy("k").agg(sum(col("v")).as("x")), "mvrw-src") shouldBe true
    }
  }

  test("key-constrained filters transplant onto the partials; non-key filters refuse") {
    buildView()
    // filter on a view KEY: rewrites, results exact
    def filtered(): DataFrame = spark.read.parquet(srcDir)
      .where(col("s2") === "s1")
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum(expr("CAST(v AS DECIMAL(18,4))")).as("sv"))
    val want = gated(on = false)(rows(filtered()))
    gated(on = true) {
      scansPath(filtered(), "mvrw-src") shouldBe false
      rows(filtered()) shouldBe want
    }
    // filtered GLOBAL aggregate matching nothing: count must be 0, not
    // NULL — the coalesce in the rewritten count path
    def nothing(): DataFrame = spark.read.parquet(srcDir)
      .where(col("k") === "no_such_key")
      .agg(count(lit(1)).as("n"), sum(expr("CAST(v AS DECIMAL(18,4))")).as("sv"))
    val want0 = gated(on = false)(rows(nothing()))
    gated(on = true) {
      scansPath(nothing(), "mvrw-src") shouldBe false
      rows(nothing()) shouldBe want0
    }
    // a predicate on a NON-key column sees inside groups — must scan
    gated(on = true) {
      scansPath(spark.read.parquet(srcDir).where(col("v") > 3)
        .groupBy("k").agg(count(lit(1)).as("n")), "mvrw-src") shouldBe true
    }
  }

  test("lockstep: appendFromSource mirrors source growth; the rewrite stays exact") {
    buildView()
    val batch = (31 to 40).map(i => (s"k${i % 3}", s"s${i % 2}", i * 0.25))
      .toDF("k", "s2", "v")
    batch.write.mode("append").parquet(srcDir)
    MvIndex.appendFromSource(batch, "mvrw_view", batchId = "growth1")
    val want = gated(on = false)(rows(plainAgg("k", "s2")))
    gated(on = true) {
      val agg = plainAgg("k", "s2")
      scansPath(agg, "mvrw-src") shouldBe false
      rows(agg) shouldBe want
    }
    // downstream operators keep working on the substituted subtree
    // (exprIds preserved): a filter + join above the rewritten agg
    gated(on = true) {
      val agg = plainAgg("k", "s2").where(col("n") > 0)
      val joined = agg.join(agg.select(col("k").as("k2")).distinct(),
        col("k") === col("k2"))
      joined.count() should be > 0L
    }
  }
}

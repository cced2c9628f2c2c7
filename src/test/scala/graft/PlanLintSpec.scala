package graft

import org.apache.spark.sql.functions._

import graft.ops.Diagnostics

/** [[Diagnostics.planLint]] — the packaged form of this repo's own
  * PlanShapeSpec checks, asserted against crafted good and bad plans.
  */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def lint(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // finalize the adaptive plan before inspecting it
    Diagnostics.planLint(df)
  }

  test("clean aggregate over parquet with pushable filter: zero findings") {
    val df = Tables.documents(spark, sf0001)
      .where(col("doc_id") < 100)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    lint(df) shouldBe empty
  }

  test("missing join condition flags cartesian") {
    // both sides DATA-SIZED (parquet scans have no static maxRows) —
    // a LocalRelation literal would now fall under the bounded-build
    // waiver, which is exactly the point of keying it on maxRows
    val a = Tables.documents(spark, sf0001).select(col("doc_id"))
    val b = Tables.load(spark, sf0001, "nation").select(col("n_nationkey"))
    val findings = lint(a.crossJoin(b))
    findings.map(_.rule) should contain("cartesian")
  }

  test("merge-hinted join of a tiny side flags broadcastable-not-broadcast") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "v").hint("merge")
    val fact = Tables.documents(spark, sf0001)
      .select((col("doc_id") % 2 + 1).as("k"), col("n_chars"))
    val findings = lint(fact.join(dim, Seq("k")))
    findings.map(_.rule) should contain("broadcastable-not-broadcast")
  }

  test("non-pushable predicate directly on the scan flags unpushed-filter") {
    val df = Tables.documents(spark, sf0001)
      .where(graft.text.Hashing.h60(col("text")) < 10L)
    val findings = lint(df)
    findings.map(_.rule) should contain("unpushed-filter")
    // ...while the same scan with a plain comparison does NOT flag
    lint(Tables.documents(spark, sf0001).where(col("doc_id") < 100))
      .map(_.rule) should not contain "unpushed-filter"
  }

  test("schemaDrift: added/removed/type/nullability changes; compatible widening silent") {
    import org.apache.spark.sql.types._
    val v1 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("price", DoubleType, nullable = true),
      StructField("note", StringType, nullable = true)))
    val v2 = StructType(Seq(
      StructField("id", LongType, nullable = true),      // loosened: compatible
      StructField("name", StringType, nullable = false), // tightened: breaking
      StructField("price", StringType, nullable = true), // re-typed
      StructField("extra", IntegerType, nullable = true))) // new; note removed
    val drift = Diagnostics.schemaDrift(v1, v2)
    drift.map(f => (f.column, f.kind)) shouldBe Seq(
      ("extra", "added"), ("name", "nullability_tightened"),
      ("note", "removed"), ("price", "type_changed"))
    Diagnostics.schemaDrift(v1, v1) shouldBe empty
  }

  test("final keyed aggregate over an exchange-free union flags the partitioning hazard") {
    // The Spark 4.1 unionOutputPartitioning hazard, reproduced exactly
    // as measured: two tables bucketed identically on the group key,
    // unioned, aggregated — the planner claims the union carries the
    // children's partitioning and elides the exchange, so the final
    // aggregate emits duplicate groups. The lint must catch the shape.
    spark.sql("DROP TABLE IF EXISTS lint_bk_a")
    spark.sql("DROP TABLE IF EXISTS lint_bk_b")
    Seq((1L, "k1"), (2L, "k2")).toDF("v", "k").write
      .bucketBy(4, "k").sortBy("k").saveAsTable("lint_bk_a")
    Seq((3L, "k1"), (4L, "k3")).toDF("v", "k").write
      .bucketBy(4, "k").sortBy("k").saveAsTable("lint_bk_b")
    val u = spark.table("lint_bk_a").unionByName(spark.table("lint_bk_b"))
    val agg = u.groupBy("k").agg(sum(col("v")).as("s"))
    val findings = lint(agg)
    // guard the guard: only assert the finding when the hazard actually
    // fired (the exchange was elided); if a future Spark fixes the
    // union claim the plan gets its exchange back and the lint must
    // stay silent
    val planStr = agg.queryExecution.executedPlan.toString
    if (!planStr.contains("Exchange hashpartitioning")) {
      findings.map(_.rule) should contain("keyed-agg-over-union")
      // and the duplicate groups are REAL — the lint flags wrong results
      agg.collect().map(_.getString(0)).groupBy(identity)
        .values.map(_.size).max should be > 1
    }
    // negative: a different-key repartition breaks the claim — exchange
    // present, no finding
    val fixed = u.repartition(col("v")).groupBy("k").agg(sum(col("v")).as("s"))
    lint(fixed).map(_.rule) should not contain "keyed-agg-over-union"
    // negative: union of unbucketed frames plans its exchange normally
    val plain = Seq((1L, "k1")).toDF("v", "k")
      .unionByName(Seq((2L, "k1")).toDF("v", "k"))
      .groupBy("k").agg(sum(col("v")).as("s"))
    lint(plain).map(_.rule) should not contain "keyed-agg-over-union"
  }

  test("CodegenFallback expression in a projection flags interpreted-expression") {
    val winnow = org.apache.spark.sql.GraftSqlShim.column(
      graft.text.WinnowFingerprint(
        org.apache.spark.sql.GraftSqlShim.expression(col("text"))))
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), winnow.as("fp")) // WinnowFingerprint: CodegenFallback
    val findings = lint(df)
    findings.map(_.rule) should contain("interpreted-expression")
    // Md5Hash60 carries real doGenCode — it must NOT flag
    lint(Tables.documents(spark, sf0001)
        .select(graft.text.Hashing.h60(col("text")).as("h")))
      .map(_.rule) should not contain "interpreted-expression"
  }

  test("allowlist: statically-bounded-build BNLJ is benign; a data-sized BNLJ still flags") {
    // class 1: crossJoin(broadcast(global agg)) — maxRows = 1, a
    // constant lookup (the r7 hand-waiver, a rule since r8)
    val docs = Tables.documents(spark, sf0001)
    val totals = broadcast(docs.agg(count(lit(1)).as("n_total")))
    lint(docs.select("doc_id").crossJoin(totals))
      .map(_.rule) should not contain "cartesian"
    // class 2 (r9): the bounded evaluation cohort — bruteForceTopK's
    // plan-level limit makes the build's maxRows static (<= 4096)
    val emb = Tables.load(spark, sf0001, "embeddings")
    lint(graft.sim.VectorFunctions.bruteForceTopK(
        emb, emb.where(col("vec_id") < 10), k = 3))
      .map(_.rule) should not contain "cartesian"
    // a small LocalRelation is also statically bounded -> benign too
    lint(docs.select("doc_id").crossJoin(broadcast(Seq(4, 5, 6).toDF("y"))))
      .map(_.rule) should not contain "cartesian"
    // but a DATA-SIZED side (no static maxRows: any scan) still flags —
    // the waiver is a static proof, not a heuristic
    val dim = broadcast(Tables.load(spark, sf0001, "nation").select(col("n_nationkey")))
    lint(docs.select("doc_id").crossJoin(dim))
      .map(_.rule) should contain("cartesian")
    // and the cohort bound is enforced, not advisory
    an[IllegalArgumentException] should be thrownBy
      graft.sim.VectorFunctions.bruteForceTopK(emb, emb, k = 3, maxQueries = 100000)
  }

  test("allowlist: IvfIndex.sortedCells' interpreted array_sort is benign; any other array_sort still flags") {
    // the shared centroid-ranking path (q47/q84/q85/q107/...): bounded
    // by nCells per row, structurally matched — benign
    val emb = Tables.load(spark, sf0001, "embeddings")
    val idx = new graft.sim.IvfIndex(nCells = 4)
    lint(idx.assign(emb)).map(_.rule) should not contain "interpreted-expression"
    // a DIFFERENT interpreted array_sort (comparator lambda, no cosine)
    // must still fail loudly — the waiver is the named shape, not the
    // class (non-literal input so constant folding can't erase it)
    val other = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        expr("array_sort(split(text, ' '), (a, b) -> length(b) - length(a))")
          .as("by_len_desc"))
    lint(other).map(_.rule) should contain("interpreted-expression")
  }
}

package graft

import graft.ops.{Diagnostics, TrackedCache}

/** The WHOLE registered query surface, plan-linted and cache-audited in
  * CI (VERDICT r9 #7/#8): every `SparkEntry.queries` entry runs at
  * sf0.001, its FINAL adaptive plan must carry zero error-severity
  * planLint findings, and after the library-style release the session
  * cache manager must be EMPTY — so a plan regression (a new
  * single-partition window, an accidental cartesian, an interpreted
  * expression) or a persist() that escapes the TrackedCache discipline
  * in ANY query fails `sbt test`, not just the round's new wave.
  *
  * Warn-severity findings (statically-bounded-build BNLJ — deliberate
  * evaluation cohorts) are allowed by contract; see planLint scaladoc.
  */
class LibraryLintSpec extends SparkSpec {

  test("every registered query: zero error-severity lint findings and an empty cache manager after release") {
    // start from a clean slate — earlier suites may have cached frames
    TrackedCache.release(spark)
    spark.sharedState.cacheManager.clearCache()

    // SPARK_GRAFT_LINT_ONLY=q301_...,q308_... → lint only those
    // (local iteration aid, same contract as Verify's SPARK_GRAFT_ONLY)
    val only = sys.env.get("SPARK_GRAFT_LINT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val failures = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      df.collect() // finalize the adaptive plan
      val errs = Diagnostics.planLint(df).filter(_.severity == "error")
      if (errs.nonEmpty)
        failures += s"$name: " + errs.map(f => s"[${f.rule}] ${f.node}").mkString(", ")
      TrackedCache.release(spark)
      if (!spark.sharedState.cacheManager.isEmpty)
        failures += s"$name: cache manager not empty after release " +
          "(a persist() site bypasses TrackedCache)"
      spark.sharedState.cacheManager.clearCache()
    }
    val report = failures.result()
    withClue(report.mkString("\n")) { report shouldBe empty }
  }
}

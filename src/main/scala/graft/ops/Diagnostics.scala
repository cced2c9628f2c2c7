package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Data-distribution diagnostics — the "is this join key going to fall
  * over at scale" report an operator library owes its users: per-key
  * cardinality stats in ONE map-side-combined pass over (key, count)
  * partials, returning a single row the driver can alert on.
  *
  * `skew_ratio` = max_n · n_keys / n_rows (hot key's multiple of the
  * mean); 1.0 is uniform, and the value is exactly the replication
  * factor at which [[RelationalOps.saltedJoin]] would level the hot
  * reducer — the report feeds the mitigation directly.
  */
object Diagnostics {

  /** Single-row skew report over `keyCol`: n_keys, n_rows, max_n,
    * hot_key (count ties → highest key), skew_ratio. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        max(struct(col("n"), col(keyCol))).getField(keyCol).as("hot_key"))
      .select(col("n_keys"), col("n_rows"), col("max_n"), col("hot_key"),
        (col("max_n").cast(DoubleType) * col("n_keys") / col("n_rows")).as("skew_ratio"))
  }

  /** Data-profiling report — one row per profiled column with row
    * count, null count, exact distinct count, and min/max rendered as
    * strings (so heterogeneous column types share one schema). The
    * generic form of the reference's coverage statistics (SURVEY §2.4
    * A6: "how many rows have a usable SIRET" is exactly a null/valid
    * profile), and the first thing a pipeline runs on a new feed.
    *
    * Scale shape: ONE pass over the table — all per-column aggregates
    * evaluate in a single hash-aggregate stage (no per-column jobs, no
    * stack/unpivot re-scan); count_distinct is the only expensive
    * member and is exact here because the profile is the oracle
    * surface — a 100 TB profile swaps it for approx_count_distinct
    * the way q46 documents. */
  /** One plan-lint finding: `rule` names the anti-pattern, `node` the
    * offending operator, `detail` what to do about it. `severity` is
    * "error" (fail CI) or "warn" (report, don't fail): a statically
    * bounded-build nested loop is a warn — deliberate bounded-cohort
    * scans (bruteForceTopK) are correct, but an ACCIDENTAL limit(4096)
    * left on a data-sized frame would both truncate data and, under
    * the old full-suppression waiver, hide the lint that used to catch
    * it (ADVICE r9) — so bounded builds now surface as warnings
    * instead of vanishing. */
  final case class LintFinding(rule: String, node: String, detail: String,
                               severity: String = "error")

  /** Static plan linter — the scale anti-pattern checks this library
    * applies to its own queries (PlanShapeSpec), packaged for user
    * plans: run it in CI against a sample of production queries and
    * fail on new findings before they ship to the 1000-executor
    * cluster. Inspects the FINAL adaptive plan, so run it after an
    * action (or accept the initial plan's estimates).
    *
    * Rules:
    *   - `cartesian`: CartesianProduct / BroadcastNestedLoopJoin — a
    *     missing join condition multiplies rows at scale.
    *   - `broadcastable-not-broadcast`: a SortMergeJoin side whose
    *     optimizer size estimate is under the autoBroadcast threshold —
    *     a shuffle (twice) where one broadcast would do; usually stale
    *     stats or a threshold set to -1.
    *   - `unpushed-filter`: a Filter sitting DIRECTLY on a file scan
    *     that reports no pushed filters — the predicate is evaluated
    *     row-by-row after a full read (non-pushable expressions like
    *     UDF-wrapped columns do this silently).
    *   - `interpreted-expression`: Project/Filter outside every
    *     WholeStageCodegen span — evaluates on the slow interpreted
    *     path (the q78 PQ forest pathology).
    *   - `unpartitioned-ranking-window`: a window with no PARTITION BY
    *     over a child with unbounded static maxRows — the whole input
    *     funnels through ONE task (use globalRowNumber instead).
    *   - `cartesian-bounded` (warn): nested-loop join whose build side
    *     is statically bounded in (1, 4096] rows — deliberate for
    *     evaluation cohorts, a truncation bug if accidental.
    */
  def planLint(df: DataFrame): Seq[LintFinding] = {
    import org.apache.spark.sql.execution._
    val helper = new adaptive.AdaptiveSparkPlanHelper {}
    val plan = df.queryExecution.executedPlan
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      catch { case _: Exception => raw.toLong }
    val out = Seq.newBuilder[LintFinding]

    helper.collect(plan) { case j: joins.CartesianProductExec => j }.foreach(j =>
      out += LintFinding("cartesian", j.nodeName,
        "join has no usable equi-condition; rows multiply at scale"))
    helper.collect(plan) { case j: joins.BroadcastNestedLoopJoinExec => j }.foreach { j =>
      // ALLOWLISTED CLASSES, both keyed on Catalyst's STATIC maxRows
      // of the build side's logical child (a data-sized side has
      // maxRows None and can never slip through):
      //  - ≤ 1 row: the `crossJoin(broadcast(agg))` totals-attach
      //    pattern every report query uses (encoded r8, VERDICT r7 #3)
      //    — the "nested loop" is a constant lookup;
      //  - ≤ 4096 rows: the bounded evaluation COHORT of the
      //    brute-force retrieval baselines (q32/q156/q193/q195 …) —
      //    `bruteForceTopK` makes the bound a plan-level `limit`
      //    precisely so this proof is static (encoded r9). The scan of
      //    corpus × bounded-cohort IS the operator being evaluated,
      //    not an accident.
      val buildLogical = j.logicalLink.flatMap { l =>
        j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => l.children.headOption
          case _ => l.children.lastOption
        }
      }
      // The join node's logicalLink is DROPPED nondeterministically
      // under AQE replanning (observed: a benign 1-row totals-attach
      // flagged error in one full-registry sweep, clean on every
      // re-run and in isolation). Fall back to the build-side PHYSICAL
      // subtree: the topmost node there that still links to a REAL
      // logical plan with a static maxRows proves the same bound.
      // LogicalQueryStage links are excluded — their maxRows is the
      // stage's RUNTIME row count, and the waiver is a static proof,
      // not a heuristic (a data-sized side must still flag).
      val buildPhysical = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case _ => j.right
      }
      val buildMax = buildLogical.flatMap(_.maxRows).orElse(
        helper.collect(buildPhysical) { case p =>
          p.logicalLink
            .filterNot(_.isInstanceOf[adaptive.LogicalQueryStage])
            .flatMap(_.maxRows)
        }.flatten.headOption)
      if (buildMax.exists(_ <= 1L)) {
        // totals-attach: constant lookup, fully benign
      } else if (buildMax.exists(_ <= 4096L)) {
        // bounded cohort: correct when deliberate (bruteForceTopK),
        // wrong when an accidental limit() truncated a data-sized
        // frame — warn-level so it's visible without failing CI
        out += LintFinding("cartesian-bounded", j.nodeName,
          s"nested-loop join with a statically bounded build side " +
            s"(maxRows=${buildMax.get}): fine for a deliberate evaluation " +
            "cohort, a data-truncation bug if the limit was accidental",
          severity = "warn")
      } else {
        out += LintFinding("cartesian", j.nodeName,
          "nested-loop join: every streamed row scans the whole broadcast side")
      }
    }

    // Unpartitioned ranking/analytic window over an unbounded child:
    // `row_number()/ntile(...).over(Window.orderBy(...))` (no
    // partitionBy) funnels the ENTIRE input through one task — the
    // canonical single-partition OOM cliff at corpus scale. Waived
    // when the child's STATIC maxRows is ≤ 4096 (rank-after-limit
    // report shaping, e.g. a top-30 panel); anything data-sized must
    // route through RelationalOps.globalRowNumber.
    helper.collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      if (w.partitionSpec.isEmpty) {
        val childBounded = w.logicalLink
          .flatMap(_.children.headOption).flatMap(_.maxRows).exists(_ <= 4096L)
        if (!childBounded)
          out += LintFinding("unpartitioned-ranking-window", w.nodeName,
            "window with no PARTITION BY sinks the whole input through one " +
              "task; use RelationalOps.globalRowNumber (range-partition + " +
              "offset pass) for data-sized frames")
      }
    }

    // Keyed operator fed by a UNION with no exchange in between — the
    // Spark 4.1 `spark.sql.unionOutputPartitioning` hazard (default
    // true): a Union whose children all report the same hash
    // partitioning CLAIMS it while CONCATENATING child partitions, so
    // equal keys from different children never co-locate, the planner
    // elides the exchange a final aggregate / partitioned window needs
    // (an explicit same-key repartition is elided too), and the
    // operator silently emits duplicate groups. Measured in this
    // engine: groupBy(gram, source) over base ∪ delta of two
    // same-bucketed index tables returned both pre-merge rows
    // (GramIndexSpec pins the operator-level regression; readers now
    // avoid load-bearing union claims structurally). Any plan where a
    // final keyed aggregate or a partitioned window reaches a
    // multi-child Union without crossing a shuffle is wrong results
    // waiting to happen → error.
    {
      def unionBeforeExchange(start: SparkPlan): (Boolean, Int) = {
        var cur: SparkPlan = start.children.headOption.orNull
        var aggsBetween = 0
        var hops = 0
        while (cur != null && hops < 64) {
          cur match {
            case u: UnionExec =>
              return (u.children.size > 1, aggsBetween)
            case _: exchange.ShuffleExchangeLike => return (false, 0)
            case _: adaptive.QueryStageExec => return (false, 0)
            case _: adaptive.AQEShuffleReadExec => return (false, 0)
            case a: aggregate.BaseAggregateExec =>
              if (a.groupingExpressions.nonEmpty) aggsBetween += 1
              cur = a.child
            case p if p.children.size == 1 => cur = p.children.head
            case _ => return (false, 0)
          }
          hops += 1
        }
        (false, 0)
      }
      import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final}
      helper.collect(plan) { case a: aggregate.BaseAggregateExec => a }.foreach { a =>
        if (a.groupingExpressions.nonEmpty) {
          val finalModes = a.aggregateExpressions
            .exists(ae => ae.mode == Final || ae.mode == Complete)
          val (hitsUnion, aggsBetween) = unionBeforeExchange(a)
          // function-less (pure distinct) nodes can't be told partial
          // from final by mode: the FINAL one is the node with its
          // partial twin between it and the union; a bare partial over
          // a union is legal and its final parent is flagged instead
          if (hitsUnion && (finalModes || aggsBetween >= 1))
            out += LintFinding("keyed-agg-over-union", a.nodeName,
              "final keyed aggregate reaches a multi-child Union with no " +
                "shuffle in between: union partition concatenation means " +
                "equal keys never meet (unionOutputPartitioning hazard) — " +
                "break the union's partitioning claim (location read / " +
                "different-key repartition / per-key join fold)")
        }
      }
      helper.collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.foreach { w =>
        if (w.partitionSpec.nonEmpty && unionBeforeExchange(w)._1)
          out += LintFinding("window-over-union", w.nodeName,
            "partitioned window reaches a multi-child Union with no shuffle " +
              "in between (unionOutputPartitioning hazard): frames split " +
              "across union children never meet")
      }
    }

    if (threshold > 0) helper.collect(plan) {
      case j: joins.SortMergeJoinExec => j
    }.foreach { j =>
      // AQE rewrites the physical sides (query stages lose the link) —
      // the JOIN's own logical node still carries both children's
      // stats. Only sides that are LEGALLY buildable for the join type
      // count — a full-outer join cannot broadcast-hash at all, a left
      // outer/semi/anti can only build right, a right outer only left;
      // flagging an illegal side was a rule bug (q80/q92 full-outer
      // fusion joins of two 30-row frames flagged a join Spark cannot
      // broadcast under any stats).
      import org.apache.spark.sql.catalyst.plans._
      j.logicalLink.foreach {
        case jn: org.apache.spark.sql.catalyst.plans.logical.Join =>
          val buildRightLegal = jn.joinType match {
            case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
            case _: ExistenceJoin => true
            case _ => false
          }
          val buildLeftLegal = jn.joinType match {
            case Inner | Cross | RightOuter => true
            case _ => false
          }
          val sides = Seq((jn.left, buildLeftLegal), (jn.right, buildRightLegal))
          sides.foreach { case (side, legal) =>
            val est = side.stats.sizeInBytes
            if (legal && est <= threshold)
              out += LintFinding("broadcastable-not-broadcast", j.nodeName,
                s"join side estimated $est bytes (<= $threshold) yet sort-merges; " +
                  "check stats freshness / broadcast hint")
          }
        case _ => ()
      }
    }

    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    // a Filter "directly on the scan" may be separated by codegen
    // plumbing (ColumnarToRow, InputAdapter) — strip those wrappers
    def scanBelow(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case s: FileSourceScanExec => Some(s)
      case c: ColumnarToRowExec => scanBelow(c.child)
      case i: InputAdapter => scanBelow(i.child)
      case _ => None
    }
    // A conjunct parquet COULD have pushed: plain attribute vs literal
    // comparison / IN / string prefix. A predicate of this shape left
    // unpushed is an error (stats or planner bug); anything else (a
    // hash-sampling gate, a function of several columns, a custom
    // expression) CANNOT push by construction — at scan grain it still
    // prunes columns, and filtering after the read is the only
    // possible evaluation — so it reports as a warn, not an error.
    def pushableShaped(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
      import org.apache.spark.sql.catalyst.expressions._
      def attr(x: Expression) = x.isInstanceOf[AttributeReference]
      e match {
        case b: BinaryComparison =>
          (attr(b.left) && b.right.foldable) || (attr(b.right) && b.left.foldable)
        case In(a, list) => attr(a) && list.forall(_.foldable)
        case i: InSet => attr(i.child)
        case StartsWith(a, p) => attr(a) && p.foldable
        case EndsWith(a, p) => attr(a) && p.foldable
        case Contains(a, p) => attr(a) && p.foldable
        case IsNull(a) => attr(a)
        case Not(inner) => pushableShaped(inner)
        case Or(l, r) => pushableShaped(l) && pushableShaped(r)
        case _ => false
      }
    }
    helper.collect(plan) { case f: FilterExec => f }.foreach { f =>
      scanBelow(f.child).foreach { scan =>
        // IsNotNull residue is normal (join-key null guards are often
        // the only thing pushABLE); the smell is a SUBSTANTIVE
        // predicate with no substantive pushed twin
        val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
        val pushedSubstantive = pushed.stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim).exists(s => s.nonEmpty && !s.startsWith("IsNotNull"))
        val condSubstantive = conjuncts(f.condition).filterNot(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
        if (condSubstantive.nonEmpty && !pushedSubstantive) {
          val sev = if (condSubstantive.exists(pushableShaped)) "error" else "warn"
          out += LintFinding("unpushed-filter", scan.nodeName,
            s"filter [${condSubstantive.head.sql.take(120)}] evaluates after a " +
              (if (sev == "error")
                "full read despite a pushable shape; check stats/planner"
              else
                "full read; the predicate shape cannot push down (expected " +
                  "for hash/sampling gates — columns still prune)"),
            severity = sev)
        }
      }
    }

    // interpreted expressions: CodegenFallback expressions survive
    // INSIDE a WholeStageCodegen span (the generated code calls their
    // interpreted eval per row), so detection walks expression trees,
    // not codegen boundaries — the q78 pathology (a fused native
    // expression with doGenCode is the fix, PqEncode/AdcScore precedent)
    helper.collect(plan) {
      case p: ProjectExec => (p: SparkPlan, p.projectList.map(_.toString))
      case f: FilterExec => (f: SparkPlan, Seq(f.condition.toString))
    }.foreach { case (node, _) =>
      val fallbacks = node.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
          e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]
      })
      // ALLOWLISTED CLASS (the second r7 hand-waiver, now encoded):
      // IvfIndex.sortedCells' `array_sort(array(struct(-cosine, cell)…))`
      // centroid-ranking node — a PRE-EXISTING shared path (q47/q84/
      // q85/q107/q167/q168/q176) whose cost is bounded by nCells per
      // row, with the native-expression upgrade documented as the
      // escape hatch. The match is STRUCTURAL, not by name: the
      // fallback must be an array_sort whose tree contains the fused
      // CosineSimilarity expression AND the ("nc", "cell")-struct —
      // any OTHER interpreted array_sort (or any different fallback)
      // still fails loudly.
      val isSortedCellsNode: org.apache.spark.sql.catalyst.expressions.Expression => Boolean = {
        case srt if srt.prettyName == "array_sort" =>
          srt.exists(_.isInstanceOf[graft.sim.CosineSimilarity]) &&
            srt.exists {
              case s: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
                s.names.map(_.toString) == Seq("nc", "cell")
              case _ => false
            }
        case _ => false
      }
      // a fallback tree flags as a unit: the ArraySort's own
      // LambdaFunction / NamedLambdaVariable children are collected as
      // separate fallbacks, so descendants of an allowlisted root are
      // cleared with it
      val allowRoots = fallbacks.filter(isSortedCellsNode)
      val flagged = fallbacks.filterNot(fb =>
        allowRoots.exists(r => r.exists(_ eq fb)))
      if (flagged.nonEmpty) {
        // ROOT fallbacks only (a fallback inside another flagged
        // fallback is the same finding). Severity: an ENGINE-AUTHORED
        // expression (graft.* package) running interpreted is a
        // deliberate, per-expression-documented trade — each carries
        // its own bounded-cost argument and a doGenCode upgrade path
        // (Md5Hash60 / CosineSimilarity / PqEncode precedent) — so it
        // reports as warn; a BUILT-IN fallback composition (an
        // array_sort comparator lambda, a reflect() call) is the
        // accidental-interpreted-hot-path the rule exists to catch:
        // error.
        val roots = flagged.filter(fb =>
          !flagged.exists(other => (other ne fb) && other.exists(_ eq fb)))
        // Deliberate-interpreted classes report as WARN:
        //  - graft.* expressions: each carries its own bounded-cost
        //    argument and a doGenCode upgrade path (Md5Hash60 /
        //    CosineSimilarity / PqEncode precedent);
        //  - builtin HigherOrderFunction folds (aggregate / zip_with /
        //    transform / exists): the engine-wide ORDERED-FOLD
        //    reproducibility discipline (VectorFunctions scaladoc) —
        //    per-row cost is array-bounded, and the fused-native
        //    rewrite is the documented hot-path upgrade
        //    (HyperplaneBuckets, q58 2.66→0.78 s).
        // Anything else (reflect(), a script transform, an unexpected
        // fallback class) is the accidental interpreted hot path the
        // rule exists to catch: ERROR.
        val allDeliberate = roots.nonEmpty && roots.forall(r =>
          r.getClass.getName.startsWith("graft.") ||
            r.isInstanceOf[org.apache.spark.sql.catalyst.expressions.HigherOrderFunction])
        out += LintFinding("interpreted-expression", node.nodeName,
          s"${flagged.map(_.prettyName).distinct.mkString(", ")} evaluate on " +
            "the interpreted fallback path inside codegen — row-at-a-time " +
            "virtual calls in the hot loop" +
            (if (allDeliberate)
              " (deliberate: engine expression / ordered-fold HOF; fused doGenCode is the upgrade)"
            else ""),
          severity = if (allDeliberate) "warn" else "error")
      }
    }
    out.result()
  }

  /** Schema drift between two feed versions — the check a pipeline
    * runs BEFORE a batch touches standing tables (the silent killer:
    * an upstream export renames or re-types a column and every
    * downstream merge starts writing nulls). Returns one row per
    * drifted column: kind ∈ added | removed | type_changed |
    * nullability_tightened (nullable→required is the breaking
    * direction; required→nullable is compatible and not flagged).
    * Pure metadata — no data pass; wire `require(drift.isEmpty)` (or
    * an allowlist) into the ingest task next to [[Expectations]]. */
  final case class DriftFinding(column: String, kind: String, detail: String)
  def schemaDrift(old: org.apache.spark.sql.types.StructType,
                  next: org.apache.spark.sql.types.StructType): Seq[DriftFinding] = {
    val o = old.fields.map(f => f.name -> f).toMap
    val n = next.fields.map(f => f.name -> f).toMap
    val added = next.fields.filterNot(f => o.contains(f.name)).map(f =>
      DriftFinding(f.name, "added", f.dataType.simpleString))
    val removed = old.fields.filterNot(f => n.contains(f.name)).map(f =>
      DriftFinding(f.name, "removed", f.dataType.simpleString))
    val changed = old.fields.flatMap { f =>
      n.get(f.name).toSeq.flatMap { g =>
        val t = if (f.dataType != g.dataType)
          Seq(DriftFinding(f.name, "type_changed",
            s"${f.dataType.simpleString} -> ${g.dataType.simpleString}"))
        else Seq.empty
        val nl = if (f.nullable && !g.nullable)
          Seq(DriftFinding(f.name, "nullability_tightened",
            "nullable -> required: readers written against the old contract break"))
        else Seq.empty
        t ++ nl
      }
    }
    (added ++ removed ++ changed).sortBy(f => (f.column, f.kind)).toSeq
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // one narrow explode of the single aggregate row into the report
    val pairs = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(pairs: _*)).as("p")).select("p.*")
  }
}

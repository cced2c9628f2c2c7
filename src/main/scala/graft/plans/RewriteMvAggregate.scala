package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.ops.MvIndex

/** Transparent materialized-view rewrite — the warehouse feature the
  * MV family exists for: a PLAIN aggregate over a fact scan
  * (`GROUP BY k… / count(*) / sum(expr)`, optionally under a filter
  * that constrains only view-key columns) is rewritten to an aggregate
  * of a standing [[MvIndex]] view REGISTERED FOR THAT SCAN, so the
  * query answers from O(groups × segments) partial rows instead of
  * re-reading the fact table. The user writes the from-scratch
  * aggregate; the optimizer substitutes the view.
  *
  * Entitlement is the lockstep stamp ([[MvIndex.writeFromSource]]):
  * the view records the scan's qualified root paths and each measure's
  * SQL, asserting its state ≡ the aggregate of the CURRENT source
  * content (maintained by [[MvIndex.appendFromSource]] as batches
  * land). The rule verifies everything verifiable — scan identity,
  * key coverage, per-expression semantic equality — and trusts the
  * maintenance discipline to the writer, exactly a warehouse MV's
  * contract.
  *
  * Matched shape, deliberately conservative (anything else is left
  * untouched — fail closed, never rewrite-and-hope):
  *   - `Aggregate` over the source `LogicalRelation`, optionally
  *     through a pure column-pruning `Project` and/or ONE `Filter`
  *     whose deterministic condition references only view-KEY columns
  *     — every row of a fine-grain group shares its key values, so
  *     filtering partials ≡ filtering rows (a predicate touching any
  *     non-key column bails: the view cannot see inside a group);
  *   - grouping expressions are bare source columns, a subset of the
  *     view's keys (a coarser GROUP BY rolls up from the partials —
  *     the aggregate-navigator law);
  *   - every embedded aggregate call is `count(*)` (n is summable) or
  *     `sum(e)` with `e` semantically equal to a recorded measure
  *     expression, re-resolved against this scan's attributes (never
  *     matched by rendered-string fragility), of an exact (decimal /
  *     integral) type; no DISTINCT, no FILTER clauses. The calls may
  *     sit under scalar expressions — CollapseProject folds final
  *     projections into the aggregate list, so `cast(sum(x) as
  *     double)` and avg-shaped `sum(x) / count(*)` are the common
  *     real shapes — and the rewrite substitutes the partial fold
  *     inside them, typed back to each call's result type.
  *
  * The replacement is pure Catalyst: `Aggregate(keys, partial-sums,
  * [Filter(pred′,)] serve-plan)` whose aggregate list carries the
  * ORIGINAL output names, exprIds, and types (count(*) becomes
  * `coalesce(sum(n), 0)` — a filter matching nothing must yield the
  * global aggregate's 0-count row, not NULL; sum partials are
  * DECIMAL(38,8) cast back to each Sum's result type — exact decimal
  * arithmetic, value-preserving), so parent operators never see the
  * substitution.
  *
  * Gate: `spark.graft.mvRewrite` (default FALSE — opt in per session
  * or per query). Unlike [[RewriteRangeJoin]] this rule changes WHICH
  * DATA a plan reads, not just its shape; it must never silently
  * retarget a query in a session that didn't ask for it (a benchmarked
  * from-scratch aggregate would otherwise quietly measure the MV).
  */
case class RewriteMvAggregate(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.mvRewrite", "false") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  /** The scan under the aggregate — through a pure column-pruning
    * Project and/or one Filter (what the main optimizer batches leave
    * between them). Returns (relation, filter condition if any). */
  private def scanOf(child: LogicalPlan): Option[(LogicalRelation, Option[Expression])] = {
    def strip(p: LogicalPlan, cond: Option[Expression]): Option[(LogicalRelation, Option[Expression])] =
      p match {
        case lr: LogicalRelation => Some((lr, cond))
        case Project(ps, q) if ps.forall(_.isInstanceOf[AttributeReference]) =>
          strip(q, cond)
        case Filter(c, q) if cond.isEmpty && c.deterministic => strip(q, Some(c))
        case _ => None
      }
    strip(child, None)
  }

  /** Recorded measure SQL, re-resolved against THIS scan's attributes
    * (by-name, case-insensitive — source columns are unambiguous). */
  private def resolveSql(sql: String, out: Seq[Attribute]): Option[Expression] =
    try {
      var ok = true
      val res = spark.sessionState.sqlParser.parseExpression(sql).transformUp {
        case u: UnresolvedAttribute =>
          out.find(_.name.equalsIgnoreCase(u.nameParts.last)) match {
            case Some(a) => a
            case None => ok = false; u
          }
      }
      if (ok && res.resolved) Some(res) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Exact-under-decimal-refold measure types: the view sums measures
    * as exact decimals, so only inputs whose from-scratch Sum is also
    * exact may substitute — float/double sums are order-dependent and
    * could differ in the last ulp. Fail closed. */
  private def exactType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (lr, filterCond) = scanOf(agg.child).getOrElse(return None)
    val fsr = lr.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val pathKey = fsr.location.rootPaths.map(_.toString).sorted.mkString(",")
    val views = MvIndex.lockstepViews(spark, pathKey)
    if (views.isEmpty) return None

    val keyNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    val filterRefNames = filterCond.toSeq.flatMap(_.references.toSeq.map(_.name))
    val scanIds = lr.output.map(_.exprId).toSet

    // Aggregate calls embedded in the output expressions (possibly
    // under casts/arithmetic — CollapseProject folds a final projection
    // INTO the aggregate list, so `cast(sum(x) as double)` and even
    // `sum(x) / count(1)` are the common shapes, not bare sums)
    val embedded = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae }).distinct
    val sumChildren = embedded.map {
      case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) => None
      case AggregateExpression(s: Sum, _, false, None, _)
          if exactType(s.child.dataType) => Some(s.child)
      case _ => return None // any other aggregate: the view has no partial
    }

    // cheapest covering view: grouping keys AND filter references among
    // its keys, every embedded sum semantically equal to a recorded measure
    def viewMatch(name: String, vKeys: Seq[String],
                  vMeasures: Seq[(String, String)]): Option[(String, Int, Map[Int, String])] = {
      if (!(keyNames ++ filterRefNames).forall(vKeys.contains)) return None
      val resolved = vMeasures.flatMap { case (a, sql) =>
        resolveSql(sql, lr.output).map(a -> _)
      }
      val aliasByIdx = Map.newBuilder[Int, String]
      sumChildren.zipWithIndex.foreach {
        case (Some(c), i) => resolved.find(_._2.semanticEquals(c)) match {
          case Some((a, _)) => aliasByIdx += (i -> a)
          case None => return None
        }
        case (None, _) => ()
      }
      Some((name, vKeys.size, aliasByIdx.result()))
    }
    val candidates = views.flatMap { case (n, ks, ms) => viewMatch(n, ks, ms) }
    val (view, _, aliasByIdx) =
      candidates.sortBy(c => (c._2, c._1)).headOption.getOrElse(return None)

    // the view's fine-grain serve (keys*, n, sum_*), pre-optimized
    val sPlan = MvIndex.serve(spark, view).queryExecution.optimizedPlan
    val sOut = sPlan.output
    val needed = (keyNames ++ filterRefNames ++ Seq("n") ++
      aliasByIdx.values.map("sum_" + _)).distinct
    if (needed.exists(n => !sOut.exists(_.name == n))) return None
    def servedAttr(n: String): Attribute = sOut.find(_.name == n).get

    // partial-fold replacement for each embedded aggregate call, typed
    // back to the original call's result type so surrounding scalar
    // expressions keep typechecking
    val substFor: Map[AggregateExpression, Expression] =
      embedded.zipWithIndex.map {
        case (ae, i) =>
          ae -> (aliasByIdx.get(i) match {
            case Some(alias) =>
              Cast(Sum(servedAttr(s"sum_$alias")).toAggregateExpression(),
                ae.dataType)
            case None =>
              // count(*): a filter matching no partials must still read
              // as 0 in the global (ungrouped) case — never NULL
              Coalesce(Seq(Sum(servedAttr("n")).toAggregateExpression(),
                Literal(0L)))
          })
      }.toMap

    // transplant the key-only predicate onto the served partials
    val child2 = filterCond match {
      case Some(c) =>
        var ok = true
        val c2 = c.transformUp {
          case a: AttributeReference =>
            sOut.find(_.name == a.name) match {
              case Some(s) if s.dataType == a.dataType => s
              case _ => ok = false; a
            }
        }
        if (!ok) return None
        Filter(c2, sPlan)
      case None => sPlan
    }

    // rebuild every output expression: embedded aggregates → partial
    // folds, grouping columns → served attrs; anything still referencing
    // the scan afterwards is a shape this rule doesn't understand — bail
    val aggExprs2: Seq[NamedExpression] = agg.aggregateExpressions.map { orig =>
      val rebuilt = (orig: Expression).transformUp {
        case ae: AggregateExpression => substFor(ae)
        case a: AttributeReference if keyNames.contains(a.name) && scanIds(a.exprId) =>
          servedAttr(a.name)
      }
      if (rebuilt.references.exists(r => scanIds(r.exprId))) return None
      rebuilt match {
        case Alias(child, name) => Alias(child, name)(exprId = orig.exprId)
        case other => Alias(other, orig.name)(exprId = orig.exprId)
      }
    }
    logInfo(s"mvRewrite: aggregate over $pathKey served from standing view '$view'" +
      filterCond.map(c => s" under key predicate ${c.sql}").getOrElse(""))
    Some(Aggregate(keyNames.map(servedAttr), aggExprs2, child2))
  }
}

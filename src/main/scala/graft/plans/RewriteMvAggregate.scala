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
  * (`GROUP BY k… / count(*) / sum(expr)`) is rewritten to a serve of a
  * standing [[MvIndex]] view REGISTERED FOR THAT SCAN, so the query
  * answers from O(groups × segments) partial rows instead of re-reading
  * the fact table. The user writes the from-scratch aggregate; the
  * optimizer substitutes the view.
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
  *   - `Aggregate` whose child is the source `LogicalRelation`
  *     (optionally through a pure column-pruning `Project`) — any
  *     Filter/expression in between bails (a filtered aggregate is NOT
  *     the view's content);
  *   - grouping expressions are bare source columns, a subset of the
  *     view's keys (a coarser GROUP BY rolls up from the partials —
  *     the aggregate-navigator law);
  *   - aggregate list contains only the grouping columns, `count(*)`
  *     (n is summable), and `sum(e)` where `e` is semantically equal
  *     to a recorded measure expression, re-resolved against this
  *     scan's attributes (never matched by rendered-string fragility);
  *     no DISTINCT, no FILTER clauses.
  *
  * The replacement subtree is the view's roll-up plan with a final
  * projection that restores the original output names, exprIds, and
  * types (sum partials are DECIMAL(38,8) and cast back to each Sum's
  * result type — exact decimal arithmetic, so the cast is
  * value-preserving), so parent operators never see the substitution.
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

  /** The scan under the aggregate: the relation itself, or through a
    * pure column-pruning projection (what the main optimizer batches
    * leave between them). */
  private def scanOf(child: LogicalPlan): Option[LogicalRelation] = child match {
    case lr: LogicalRelation => Some(lr)
    case Project(ps, lr: LogicalRelation)
        if ps.forall(_.isInstanceOf[AttributeReference]) => Some(lr)
    case _ => None
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

  private sealed trait Out
  private case class KeyOut(name: String) extends Out
  private case object CountOut extends Out
  private case class SumOut(child: Expression) extends Out

  private def classify(e: NamedExpression,
                       keyNames: Seq[String]): Option[Out] = e match {
    case a: AttributeReference if keyNames.contains(a.name) => Some(KeyOut(a.name))
    case Alias(a: AttributeReference, _) if keyNames.contains(a.name) =>
      Some(KeyOut(a.name))
    case Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _), _) =>
      Some(CountOut)
    case Alias(AggregateExpression(s: Sum, _, false, None, _), _) =>
      Some(SumOut(s.child))
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val lr = scanOf(agg.child).getOrElse(return None)
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
    val outs = agg.aggregateExpressions.map(e =>
      classify(e, keyNames).getOrElse(return None))

    // cheapest covering view: every grouping key among its keys, every
    // sum child semantically equal to one of its recorded measures
    def viewMatch(name: String, vKeys: Seq[String],
                  vMeasures: Seq[(String, String)]): Option[(String, Int, Seq[String])] = {
      if (!keyNames.forall(vKeys.contains)) return None
      val resolved = vMeasures.flatMap { case (a, sql) =>
        resolveSql(sql, lr.output).map(a -> _)
      }
      val sumAliases = Seq.newBuilder[String]
      outs.foreach {
        case SumOut(c) => resolved.find(_._2.semanticEquals(c)) match {
          case Some((a, _)) => sumAliases += a
          case None => return None
        }
        case _ => ()
      }
      Some((name, vKeys.size, sumAliases.result()))
    }
    val candidates = views.flatMap { case (n, ks, ms) => viewMatch(n, ks, ms) }
    val (view, _, sumAliases) =
      candidates.sortBy(c => (c._2, c._1)).headOption.getOrElse(return None)

    val served = MvIndex.serveRollup(spark, view, keyNames)
    val sPlan = served.queryExecution.optimizedPlan
    val sOut = sPlan.output
    val needed = keyNames ++
      (if (outs.contains(CountOut)) Seq("n") else Nil) ++
      sumAliases.map("sum_" + _)
    if (needed.exists(n => !sOut.exists(_.name == n))) return None
    def servedAttr(n: String): Attribute = sOut.find(_.name == n).get

    var sumIdx = -1
    val projections: Seq[NamedExpression] =
      agg.aggregateExpressions.zip(outs).map { case (orig, out) =>
        val child: Expression = out match {
          case KeyOut(n) => servedAttr(n)
          case CountOut => servedAttr("n")
          case SumOut(_) =>
            sumIdx += 1
            Cast(servedAttr(s"sum_${sumAliases(sumIdx)}"), orig.dataType)
        }
        Alias(child, orig.name)(exprId = orig.exprId)
      }
    logInfo(s"mvRewrite: aggregate over $pathKey served from standing view '$view'")
    Some(Project(projections, sPlan))
  }
}

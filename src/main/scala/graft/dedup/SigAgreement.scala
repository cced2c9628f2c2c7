package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Estimated Jaccard between two k-long minhash signatures: the
  * fraction of positions that agree, `|{i : a[i] == b[i]}| / k` as a
  * double — value-identical to the unrolled
  * `sum(CASE WHEN element_at(a,i)=element_at(b,i) THEN 1 END) / k`
  * tree it replaces (the count is an exact small integer, the divide
  * is the same double op).
  *
  * Why native: the unrolled tree is 2·k `element_at` calls plus k
  * CASEs per row, and Catalyst SUBSTITUTES it through the projection
  * into the verification join's non-equi condition — so the whole
  * ~100-node tree evaluates twice per candidate pair (join condition
  * + output column), dominating the verify phase at ~5M raw pairs per
  * kernel run. This expression is one fused loop over the two long
  * arrays with real `doGenCode`, so both evaluations stay inside
  * whole-stage codegen at ~k long-compares each.
  *
  * Null/shape semantics mirror the tree where reachable: a null array
  * yields 0.0 (each CASE fell to ELSE 0), not NULL; positions beyond
  * either array's length count as disagreement (the tree threw there
  * under ANSI `element_at`, but signatures are fixed k-long by
  * construction — [[MinHashSignature]] — so the branch is unreachable
  * and the total function is the safer contract). */
case class SigAgreement(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  require(k > 0, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_agreement expects two array<bigint>, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sig_agreement"

  private def agree(a: ArrayData, b: ArrayData): Int = {
    val lim = math.min(k, math.min(a.numElements(), b.numElements()))
    var c = 0
    var i = 0
    while (i < lim) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) 0.0
    else agree(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]).toDouble / k
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val cnt = ctx.freshName("agree")
    val i = ctx.freshName("i")
    val lim = ctx.freshName("lim")
    ev.copy(isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${lGen.code}
        ${rGen.code}
        double ${ev.value} = 0.0;
        if (!${lGen.isNull} && !${rGen.isNull}) {
          int $lim = java.lang.Math.min($k,
            java.lang.Math.min(${lGen.value}.numElements(), ${rGen.value}.numElements()));
          int $cnt = 0;
          for (int $i = 0; $i < $lim; $i++) {
            if (!${lGen.value}.isNullAt($i) && !${rGen.value}.isNullAt($i)
                && ${lGen.value}.getLong($i) == ${rGen.value}.getLong($i)) $cnt++;
          }
          ${ev.value} = ((double) $cnt) / $k;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

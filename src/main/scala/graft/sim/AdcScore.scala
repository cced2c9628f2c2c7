package graft.sim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** PQ asymmetric-distance score of one (query, code-vector) pair:
  * Σ_j dot(q_subspace_j, centroid_{j, codes[j]}), doubles accumulated
  * in fixed (j, t) order — term-identical to the per-query lookup-table
  * formulation ([[PqIndex.searchAdcViaTables]]) and to the DuckDB
  * oracle's ordered-list fold, so swapping implementations never moves
  * a hash.
  *
  * Why native, and why no tables: the classic ADC table turns the
  * per-pair cost from dim into m multiplies — but as BUILTIN
  * expressions inside a BroadcastNestedLoopJoin (which never enters
  * whole-stage codegen) the m nested element_at lookups evaluate
  * interpreted per pair, and the m·ksub table array rides along in
  * every joined row; measured SLOWER than [[CosineSimilarity]]'s
  * native 64-float loop on the same join shape. This expression is the
  * same fused-loop trade: one virtual call per pair, primitive
  * multiply-accumulate inside, broadcast rows carry only the query
  * floats. (A native table-lookup path would win again once dim ≫ m
  * at equal nativeness; at dim 64 / m 8 the difference is noise.)
  */
case class AdcScore(left: Expression, right: Expression,
                    codebook: Array[Array[Array[Float]]])
  extends BinaryExpression with CodegenFallback {

  private val m = codebook.length
  private val sub = codebook.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_adc_score expects (array<float>, array<int>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_score"

  override def nullSafeEval(q: Any, cd: Any): Any = {
    val emb = q.asInstanceOf[ArrayData]
    val codes = cd.asInstanceOf[ArrayData]
    if (emb.numElements() < m * sub || codes.numElements() < m) return null
    var score = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      // null, not an executor crash, for codes outside the codebook —
      // this is a public expression, not only `encode`'s output
      if (code < 0 || code >= codebook(j).length) return null
      val cen = codebook(j)(code)
      val base = j * sub
      var term = 0.0
      var t = 0
      while (t < sub) {
        term += emb.getFloat(base + t).toDouble * cen(t).toDouble
        t += 1
      }
      score += term
      j += 1
    }
    score
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.sim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization encode as a native expression: per subspace j,
  * the id of the L2-nearest codebook centroid (ties → lowest id), over
  * an `array<float>` embedding.
  *
  * Why native: the built-in formulation is an m·ksub·(dim/m)-term
  * expression forest (~1 000 element_at/cast/struct nodes for
  * 8×16×8) — far past the size whole-stage codegen accepts, so it
  * evaluated INTERPRETED, one boxed node at a time (measured 1.8 s for
  * a 5 000-row narrow projection at sf0.1 — slower than the minhash
  * stage it sits next to). This eval is one virtual call per row and a
  * fused primitive loop inside: measured ~20× faster on the same
  * stage. Same trade as [[graft.dedup.MinHashSignature]] /
  * [[CosineSimilarity]]: when the per-row arithmetic is a dense fixed
  * loop, a native expression beats a built-in forest that codegen
  * refuses.
  *
  * Arithmetic is float-subtract → double-multiply-accumulate in fixed
  * t order, identical to the built-in formulation and to the DuckDB
  * oracle rendering (q78) — [[PqIndexSpec]] pins encode values, the
  * oracle pins them cross-engine.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
  extends UnaryExpression with CodegenFallback {

  private val m = codebook.length
  private val ksub = codebook.headOption.map(_.length).getOrElse(0)
  private val sub = codebook.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pq_encode expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < m * sub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val cen = codebook(j)(c)
        var d = 0.0
        var t = 0
        while (t < sub) {
          // float subtraction happens in DOUBLE space in the builtin
          // twin (both operands are cast before the subtract), so
          // widen first here too
          val x = arr.getFloat(base + t).toDouble - cen(t).toDouble
          d += x * x
          t += 1
        }
        if (d < best) { best = d; bestC = c } // strict <: ties keep lowest c
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.dedup

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.text.Hashing

/** The k-permutation MinHash signature of a token array, computed per
  * row in ONE pass: distinct tokens (deduped in-expression), k/4 seeded
  * md5 digests per token ("s:" digested ahead of the token bytes), four
  * independent 28-bit lanes per digest (graft.text.Hashing.hash28Lanes),
  * k running minima. Value-identical to the explode + k-min-columns
  * aggregation ([[Dedup.minhashSignaturesViaAggregate]], pinned by
  * DedupSpec) and therefore to the DuckDB oracle.
  *
  * Why a native expression: signatures are a pure per-document
  * function. The aggregate formulation shuffles one combined row per
  * (doc, map-partition) and runs a 32-column hash-aggregate; this pass
  * emits exactly one 32-long array per document from the narrow stage —
  * at 100 TB the signature stage becomes embarrassingly parallel and
  * the only shuffle left in candidate generation is the banded bucket
  * join itself. CodegenFallback is fine: eval runs once per document
  * and is itself a tight loop over (tokens × k).
  */
case class MinHashSignature(child: Expression, k: Int = 32)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  require(k % 4 == 0, s"k must be a multiple of 4 (4 lanes per md5 digest), got $k")

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(k / 4)(s => s"$s:".getBytes(StandardCharsets.UTF_8))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    val lanes = new Array[Long](4)
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          val bytes = tok.getBytes
          var s = 0
          while (s < k / 4) {
            Hashing.hash28Lanes(seedPrefixes(s), bytes, lanes, 0)
            var j = 0
            while (j < 4) {
              val p = s * 4 + j
              if (lanes(j) < mins(p)) mins(p) = lanes(j)
              j += 1
            }
            s += 1
          }
        }
      }
      i += 1
    }
    if (seen.isEmpty) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

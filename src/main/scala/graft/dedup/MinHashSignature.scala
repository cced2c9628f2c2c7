package graft.dedup

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.text.Hashing

/** The k-permutation MinHash signature of a token array, computed per
  * row in ONE pass: distinct tokens (deduped in-expression), k seeded
  * md5-60 hashes per token ("i:" digested ahead of the token bytes), k
  * running minima. Value-identical to the explode + k-min-columns
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

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i:".getBytes(StandardCharsets.UTF_8))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          val bytes = tok.getBytes
          var p = 0
          while (p < k) {
            val h = Hashing.hash60Seeded(seedPrefixes(p), bytes)
            if (h < mins(p)) mins(p) = h
            p += 1
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

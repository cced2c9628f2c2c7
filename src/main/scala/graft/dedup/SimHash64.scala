package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.text.Hashing

/** 60-bit SimHash over a token array, computed per row in ONE pass:
  * each token's md5-60 hash ([[graft.text.Hashing]] — the engine-wide
  * content hash, chosen for exact DuckDB-oracle reproducibility) votes
  * ±1 on every bit; the sign of each vote sum becomes the fingerprint
  * bit. 60 bits, not 64, because the shared hash is 60-bit; Hamming
  * blocking over 16-bit chunks is unaffected (the top chunk simply has
  * 12 live bits).
  *
  * Why a native expression: the explode + per-bit-sum-columns
  * formulation shuffles one row per (doc, token) — ~10× the corpus row
  * count — before aggregating. Fingerprinting is a pure per-document
  * function, so it belongs in the narrow stage: zero shuffle,
  * embarrassingly parallel over 100 TB. CodegenFallback is fine here —
  * the eval runs once per document and is itself a tight loop.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Hashing.hash60(arr.getUTF8String(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

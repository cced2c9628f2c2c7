package graft.text

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer et al., SIGMOD'03) as a
  * native one-pass expression: hash every character k-gram (xxhash64,
  * seed 42 — identical values to the SQL `xxhash64`), take the minimum
  * of each sliding window of `w` hashes with a monotonic deque, dedupe
  * preserving first occurrence.
  *
  * Why native: the higher-order-function formulation
  * (`transform(sequence(...), i -> array_min(slice(hashes, i, w)))`)
  * evaluates interpreted at O(len·w) with a fresh w-array allocation
  * per window — measured ~850 CPU-seconds for 5 000 ~300-char docs on
  * one thread. This pass is O(len) with O(1) amortized per step and
  * runs once per document.
  */
case class WinnowFingerprint(child: Expression, k: Int = 8, w: Int = 4)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_winnow expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  private def hash(s: UTF8String): Long = XxHash64Function.hash(s, StringType, 42L)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val len = text.numChars()
    if (len < k) return new GenericArrayData(Array(hash(text)))
    val n = len - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    if (text.numBytes() == len) {
      // ASCII fast path: chars are bytes — hash each k-gram in place
      // from the backing array, zero allocations (identical values:
      // UTF8String hashing IS xxhash64 over its utf-8 bytes)
      val base = text.getBaseObject
      val off = text.getBaseOffset
      while (i < n) {
        hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + i, k, 42L)
        i += 1
      }
    } else {
      while (i < n) { hashes(i) = hash(text.substringSQL(i + 1, k)); i += 1 }
    }
    val out = new mutable.LinkedHashSet[Long]
    if (n < w) {
      var j = 0
      while (j < n) { out += hashes(j); j += 1 }
    } else {
      // monotonic deque of indices; head is the window minimum
      val deque = new java.util.ArrayDeque[Int]
      var j = 0
      while (j < n) {
        while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(j)) deque.pollLast()
        deque.addLast(j)
        if (deque.peekFirst() <= j - w) deque.pollFirst()
        if (j >= w - 1) out += hashes(deque.peekFirst())
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

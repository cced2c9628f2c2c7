package graft.text

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Compression-ratio quality signal: deflate(text).size / text.size —
  * the classic cheap proxy for text quality in training-data curation
  * (used by the CCNet/Gopher-family pipelines): highly repetitive or
  * templated documents compress far below natural prose, and
  * random/binary junk doesn't compress at all. Complements the token-
  * level repetition fractions ([[QualityOps.repetitionStats]]) with a
  * character-level signal that catches repetition n-gram windows miss
  * (long-period boilerplate, whitespace art, encoded blobs).
  *
  * A native expression because deflate is a per-row byte kernel (the
  * same argument as the multimodal codecs — not Column-expressible),
  * but unlike those it needs no external library: `java.util.zip`
  * ships with the JDK, so the kernel is REAL, not a stub. One Deflater
  * per eval, BEST_SPEED level — the signal needs relative ordering,
  * not optimal encoding, and level 1 is ~3× faster than the default.
  *
  * Scale shape: pure narrow per-row work — at 100 TB this pipelines
  * inside the same scan stage as tokenization; nothing shuffles.
  * The RATIO VALUE depends on the zlib implementation (JDK version),
  * so oracled queries export bounded-contract booleans, never the raw
  * ratio (the q46/q55 sketch discipline).
  */
case class DeflateRatio(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_ratio expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_deflate_ratio"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    if (bytes.isEmpty) return null
    // one Deflater per executor THREAD, reset between rows: deflateInit
    // allocates ~256 KB of native window state, and paying that per row
    // would dominate the kernel on short documents (review finding).
    // ThreadLocal (not per-expression state) because local-mode tasks
    // can share a deserialized plan across threads.
    val d = DeflateRatio.acquire()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / bytes.length
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {
  private val local: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(Deflater.BEST_SPEED))
  private val registeredFor: ThreadLocal[java.lang.Long] =
    ThreadLocal.withInitial(() => java.lang.Long.valueOf(-1L))

  /** Thread-local Deflater, freed at task end. The ~256 KB native zlib
    * window would otherwise outlive the task for the THREAD's lifetime
    * — bounded on a fixed executor pool, but a slow native leak under
    * thread churn (many short-lived local sessions). Inside a task we
    * register one completion listener per task attempt (one extra long
    * compare per row) that end()s and drops the instance; listeners
    * run on the task thread, so the ThreadLocal they clear is the
    * right one. Outside any task (driver-side eval: constant folding,
    * tests) there is no completion hook — those threads keep the
    * JVM-lifetime instance, the pre-existing bounded case. */
  private[text] def acquire(): Deflater = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && registeredFor.get() != tc.taskAttemptId()) {
      registeredFor.set(tc.taskAttemptId())
      tc.addTaskCompletionListener[Unit] { _ =>
        local.get().end()
        local.remove()
        registeredFor.set(-1L)
      }
    }
    local.get()
  }
}

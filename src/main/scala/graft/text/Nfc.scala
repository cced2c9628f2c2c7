package graft.text

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the text-hygiene step that runs BEFORE
  * any hash-keyed operator can be trusted on real crawl text: the same
  * visible string arrives from the web in composed (`é` U+00E9) and
  * decomposed (`e` + U+0301) forms, and every downstream exact-dedup
  * (q23), minhash shingle (q29), URL key (q185) or vocabulary id (q79)
  * treats the two as DIFFERENT documents unless the corpus is
  * normalized first. NFC (canonical composition) is the W3C-recommended
  * web form; NFKC (compatibility) is deliberately NOT offered here —
  * it is lossy (ligatures, super/subscripts) and a curation pipeline
  * should opt in explicitly.
  *
  * Spark has no normalization builtin, so this is a native expression
  * over the JDK's [[java.text.Normalizer]] (real `doGenCode` — one
  * static call inside the scan's whole-stage-codegen span, the
  * BoilerplateCensus pattern). The fast path is the JDK's own
  * `isNormalized` quick-check: ASCII and already-composed text (the
  * overwhelming majority of a real corpus) never allocates.
  *
  * Cross-engine contract: the q188 oracle runs DuckDB's INDEPENDENT
  * NFC (utf8proc) on identically-constructed input — two separate
  * implementations of UAX#15 must produce byte-identical output for
  * the match to pass, which pins the semantics far harder than a
  * mirrored formula. NfcSpec additionally pins the classic cases
  * (combining acute, Angstrom sign, Hangul jamo, NFC-invariant
  * ligature) by direct construction.
  *
  * Scale shape: pure narrow per-row work in the scan stage; nothing
  * shuffles.
  */
object Nfc {

  /** NFC-normalize a string column. */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(NfcNormalize(
      org.apache.spark.sql.GraftSqlShim.expression(text)))

  /** Kernel (called from generated code). `isNormalized` is a cheap
    * scan using the same per-codepoint quick-check table the W3C
    * recommends; only strings that might change pay the compose. */
  def nfcEval(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Native NFC normalization expression — see [[Nfc.nfc]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    Nfc.nfcEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = graft.text.Nfc.nfcEval($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.text

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-wide md5-60 content hash ([[Hashing]]) as a native
  * codegen'd expression: utf-8 bytes → MD5 digest → top-60-bits long,
  * in one static call inside whole-stage codegen.
  *
  * Why native: the builtin formulation
  * (`conv(substring(md5(x),1,15),16,10)`) produces the identical value
  * but materializes a 32-char hex UTF8String per hash and re-parses 15
  * chars of it; on the minhash path (32 seeded hashes per distinct
  * token) that render/parse pair dominates. The optional `prefix` is
  * the minhash seed ("i:"), digested ahead of the value bytes so no
  * per-row concatenation is allocated — equal by construction to
  * hashing the concatenated string, which is what the DuckDB oracle
  * (`md5(concat(i, ':', tok))`) computes.
  */
case class Md5Hash60(child: Expression, prefix: String = "")
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_md5h60 expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5h60"

  private lazy val prefixBytes: Array[Byte] =
    prefix.getBytes(StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (prefixBytes.isEmpty) Hashing.hash60(s)
    else Hashing.hash60Seeded(prefixBytes, s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      if (prefix.isEmpty) {
        s"${ev.value} = graft.text.Hashing.hash60($s);"
      } else {
        val pref = ctx.addReferenceObj("md5h60Prefix", prefixBytes, "byte[]")
        s"${ev.value} = graft.text.Hashing.hash60Seeded($pref, $s);"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

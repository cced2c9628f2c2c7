package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML tag-strip + line-density boilerplate removal — the FIRST
  * operator a crawl-corpus pipeline runs, before token counts (q24),
  * repetition (q75) or drop-reason audits (q158) ever see the text.
  * Rules are the trafilatura/jusText line-density family reduced to
  * their portable core: a markup line is CONTENT if, after tag
  * stripping, enough text remains (absolute length gate) AND the text
  * dominates the markup (density gate) — navigation, menus, social
  * bars and footers fail one or both.
  *
  * Everything here is a PER-DOCUMENT pure function built from
  * codegen'd builtins (split / transform / filter / regexp_replace /
  * aggregate): zero shuffle, zero UDF, runs inside the scan's
  * whole-stage-codegen span — the 100 TB shape (the reference pipeline
  * family never sees raw HTML; this is extension surface, so the
  * contract is pinned by the q182 oracle + QualitySpec edge cases).
  *
  * Tag stripping is the standard `<[^>]*>` best-effort regex,
  * deliberately NOT an HTML parser:
  *   - nested tags strip fine (each tag matches separately);
  *   - a MALFORMED tag whose attribute quote swallows the `>`
  *     (`<div class="promo><b>`) strips up to the first available
  *     `>` — deterministic, pinned in QualitySpec;
  *   - an UNCLOSED `<` with no `>` on the line strips nothing — the
  *     junk counts as text and the density gate usually drops it.
  * Both engines (Spark, DuckDB) run the identical regex, which is what
  * makes the whole operator exactly oracle-able.
  */
object Boilerplate {

  /** The tag regex both engines share (DuckDB needs the 'g' flag). */
  val TagRe = "<[^>]*>"

  /** Tag-stripped, trimmed text of one markup line. */
  def stripTags(line: Column): Column = trim(regexp_replace(line, TagRe, ""))

  /** Per-line (raw_len, txt_len, text) stats over the document's
    * lines. The density gate compares via `2·txt >= raw` — pure
    * integer arithmetic, no fp anywhere in the keep decision. */
  private def lineStats(html: Column): Column =
    transform(split(html, "\n"), l =>
      struct(length(l).as("raw"),
        length(stripTags(l)).as("txt"),
        stripTags(l).as("s")))

  private def keeps(st: Column, minTextLen: Int): Column =
    st.getField("txt") >= minTextLen &&
      st.getField("txt") * 2 >= st.getField("raw")

  /** The extracted main text: kept lines joined by newline. */
  def extract(html: Column, minTextLen: Int = 25): Column =
    array_join(
      transform(filter(lineStats(html), st => keeps(st, minTextLen)),
        st => st.getField("s")),
      "\n")

  /** Kept/dropped-line census columns for one document:
    * (n_lines, n_kept, n_short, n_lowdensity, extracted).
    * n_short: failed the absolute length gate; n_lowdensity: long
    * enough but markup-dominated. n_kept + n_short + n_lowdensity =
    * n_lines by construction.
    *
    * Default path: the NATIVE one-pass [[BoilerplateCensus]]
    * expression (real doGenCode — a static-call inside whole-stage
    * codegen; the builtin transform/filter HOF formulation evaluates
    * interpreted per line and lint-flags, the q78/HyperplaneBuckets
    * lesson). [[censusBuiltin]] is kept as the oracle-shaped twin;
    * TextFunctionsSpec pins the two value-identical. */
  def census(html: Column, minTextLen: Int = 25): Column =
    org.apache.spark.sql.GraftSqlShim.column(BoilerplateCensus(
      org.apache.spark.sql.GraftSqlShim.expression(html), minTextLen))

  /** The builtin-HOF formulation of [[census]] — value-identical
    * (spec-pinned), shaped like the DuckDB oracle; interpreted per
    * line, so the native expression is the default. */
  def censusBuiltin(html: Column, minTextLen: Int = 25): Column = {
    val stats = lineStats(html)
    val kept = filter(stats, st => keeps(st, minTextLen))
    struct(
      size(stats).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      size(filter(stats, st => st.getField("txt") < minTextLen))
        .cast("long").as("n_short"),
      size(filter(stats, st => st.getField("txt") >= minTextLen &&
        st.getField("txt") * 2 < st.getField("raw")))
        .cast("long").as("n_lowdensity"),
      array_join(transform(kept, st => st.getField("s")), "\n").as("extracted"))
  }

  /** `regexp_replace(line, "<[^>]*>", "")` as a direct scan: a `<`
    * strips through the NEXT `>` ([^>]* cannot cross one); a `<` with
    * no `>` anywhere after it matches nothing — and then no later `<`
    * can match either, so the remainder passes through verbatim.
    * Exactly the Java-regex semantics the builtin twin and the DuckDB
    * oracle run. */
  private[text] def stripTagsJava(line: String): String = {
    val sb = new java.lang.StringBuilder(line.length)
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '<') {
        val j = line.indexOf('>', i + 1)
        if (j < 0) { sb.append(line, i, line.length); i = line.length }
        else i = j + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Spark's `trim`: leading/trailing SPACES only (not Java trim's
    * all-controls). */
  private def spaceTrim(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Single-pass census kernel (called from generated code): code-point
    * lengths to match Spark's `length`. */
  def censusEval(html: UTF8String, minTextLen: Int): InternalRow = {
    val lines = html.toString.split("\n", -1)
    var kept = 0L; var short = 0L; var lowd = 0L
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val raw = line.codePointCount(0, line.length)
      val stripped = spaceTrim(stripTagsJava(line))
      val txt = stripped.codePointCount(0, stripped.length)
      if (txt < minTextLen) short += 1L
      else if (txt * 2 < raw) lowd += 1L
      else {
        if (kept > 0L) out.append('\n')
        out.append(stripped)
        kept += 1L
      }
      i += 1
    }
    InternalRow(lines.length.toLong, kept, short, lowd,
      UTF8String.fromString(out.toString))
  }
}

/** Native one-pass boilerplate census — see [[Boilerplate.census]].
  * Real `doGenCode` (static call), so the whole extraction stays
  * inside the scan's whole-stage-codegen span; the per-row kernel is
  * one linear scan of the document, no regex engine, no per-line
  * lambda dispatch. */
case class BoilerplateCensus(child: Expression, minTextLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_boilerplate_census expects string, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_short", LongType, nullable = false),
    StructField("n_lowdensity", LongType, nullable = false),
    StructField("extracted", StringType, nullable = false)))
  override def prettyName: String = "graft_boilerplate_census"

  override def nullSafeEval(input: Any): Any =
    Boilerplate.censusEval(input.asInstanceOf[UTF8String], minTextLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.text.Boilerplate.censusEval($s, $minTextLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

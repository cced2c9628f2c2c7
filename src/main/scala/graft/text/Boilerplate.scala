package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
    * n_lines by construction. */
  def census(html: Column, minTextLen: Int = 25): Column = {
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
}

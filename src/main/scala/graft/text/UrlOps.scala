package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-pipeline twin of [[Boilerplate]]:
  * before dedup or per-domain budgeting can work, the same page fetched
  * as `https://WWW.feed.example.com/en/post/7?utm_source=rss#top` and
  * `https://feed.example.com/en/post/7` must collapse to one key.
  * Rules (the portable core of the standard canonicalizers):
  *
  *   1. strip the fragment (`#…` — client-side only, never content);
  *   2. drop `utm_*` tracking parameters, preserving the others and
  *      the `?`/`&` structure;
  *   3. lowercase the scheme+host (NEVER the path — paths are
  *      case-sensitive);
  *   4. drop a leading `www.` host label.
  *
  * Every rule is a single `regexp_replace`/`regexp_extract` whose
  * pattern is RE2-compatible (no lookarounds), so the DuckDB oracle
  * runs the IDENTICAL regexes — the same cross-engine discipline as
  * the tag-strip regex in [[Boilerplate]].
  *
  * Scale shape: pure narrow per-row string work — runs inside the
  * scan's codegen span, nothing shuffles until the caller aggregates.
  */
object UrlOps {

  /** Lowercased scheme + host prefix, original path/query untouched. */
  private def lowerSchemeHost(u: Column): Column = {
    val prefix = regexp_extract(u, "^([a-zA-Z]+://[^/]*)", 1)
    concat(lower(prefix), substring(u, length(prefix) + 1, lit(1000000)))
  }

  /** Canonical URL under rules 1-4 above. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // '&utm_x=...' params drop wholesale; a LEADING '?utm_x=...&' hands
    // the '?' to the next surviving param; a sole '?utm_x=...' drops
    // with its '?'. Order matters and each pass replaces ALL
    // non-overlapping matches.
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, "&utm_[^&]*", ""),
        "\\?utm_[^&]*&", "?"),
      "\\?utm_[^&]*$", "")
    regexp_replace(lowerSchemeHost(noUtm), "://www\\.", "://")
  }

  /** Registered host of a canonicalized URL (lowercase, www-stripped —
    * run [[canonicalize]] first or accept raw-host semantics). */
  def domainOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z]+://([^/]*)", 1)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract a pipeline
  * asserts over a feed before trusting it (the reference eyeballs
  * before/after row counts in task logs; this is that discipline as an
  * operator, the shape dbt tests / Deequ standardized). All
  * expectations over a table evaluate in ONE aggregate pass (no
  * per-check jobs), return a per-check report row, and a run wires
  * `require(Expectations.holds(report))` into the task body so a bad
  * feed fails the task — and [[graft.ref.Runs]] retries/quarantines it
  * — instead of poisoning downstream tables.
  *
  * Each check compiles to (metric aggregate, pass predicate over the
  * metric, threshold rendered for the report). Uniqueness is the one
  * check that can't ride the single scalar pass (it needs a per-key
  * count) — it contributes a count-distinct to the same aggregate,
  * comparing against the row count.
  */
object Expectations {

  sealed trait Check { def name: String }
  /** Fraction of non-null values in `col` must be >= `atLeast`. */
  final case class NonNullRate(col: String, atLeast: Double) extends Check {
    val name = s"non_null_rate($col)"
  }
  /** `cols` must be a unique key (no duplicate combinations). */
  final case class UniqueKey(cols: Seq[String]) extends Check {
    val name = s"unique_key(${cols.mkString(",")})"
  }
  /** Row count within [lo, hi] (use hi = Long.MaxValue for "at least"). */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check {
    val name = s"row_count[$lo,$hi]"
  }
  /** Every non-null value of `col` drawn from `allowed`. */
  final case class ValuesIn(col: String, allowed: Seq[String]) extends Check {
    val name = s"values_in($col)"
  }
  /** min(col) >= lo and max(col) <= hi (numeric range contract). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($col)"
  }

  /** Evaluate all checks in one pass: (check, metric, threshold, pass).
    * Metrics are DOUBLE (rates and counts share a column); thresholds
    * render as strings for the report. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs: Seq[Column] = (count(lit(1)).as("__rows") +: checks.zipWithIndex.map {
      case (NonNullRate(c, _), i) => count(col(c)).cast("double").as(s"__m$i")
      case (UniqueKey(cs), i) =>
        countDistinct(struct(cs.map(col): _*)).cast("double").as(s"__m$i")
      case (RowCountBetween(_, _), i) => count(lit(1)).cast("double").as(s"__m$i")
      case (ValuesIn(c, allowed), i) =>
        sum(when(col(c).isNotNull && !col(c).isInCollection(allowed), 1L)
          .otherwise(0L)).cast("double").as(s"__m$i")
      case (InRange(c, _, _), i) =>
        // encode min/max into one metric via a struct? keep two aggs
        min(col(c)).cast("double").as(s"__mn$i")
    }) ++ checks.zipWithIndex.collect {
      case (InRange(c, _, _), i) => max(col(c)).cast("double").as(s"__mx$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val reports = checks.zipWithIndex.map {
      case (k @ NonNullRate(_, atLeast), i) =>
        val rate = col(s"__m$i") / greatest(col("__rows"), lit(1L)).cast("double")
        struct(lit(k.name).as("check"), rate.as("metric"),
          lit(s">= $atLeast").as("threshold"), (rate >= atLeast).as("pass"))
      case (k @ UniqueKey(_), i) =>
        struct(lit(k.name).as("check"), col(s"__m$i").as("metric"),
          lit("= row count").as("threshold"),
          (col(s"__m$i") === col("__rows").cast("double")).as("pass"))
      case (k @ RowCountBetween(lo, hi), i) =>
        struct(lit(k.name).as("check"), col(s"__m$i").as("metric"),
          lit(s"[$lo, $hi]").as("threshold"),
          (col(s"__m$i") >= lo.toDouble && col(s"__m$i") <= hi.toDouble).as("pass"))
      case (k @ ValuesIn(_, _), i) =>
        struct(lit(k.name).as("check"), col(s"__m$i").as("metric"),
          lit("0 violations").as("threshold"), (col(s"__m$i") === 0.0).as("pass"))
      case (k @ InRange(_, lo, hi), i) =>
        struct(lit(k.name).as("check"), col(s"__mx$i").as("metric"),
          lit(s"[$lo, $hi]").as("threshold"),
          (coalesce(col(s"__mn$i") >= lo, lit(true)) &&
            coalesce(col(s"__mx$i") <= hi, lit(true))).as("pass"))
    }
    row.select(explode(array(reports: _*)).as("r")).select("r.*")
  }

  /** True iff every check passed — the `require` a task body wires in. */
  def holds(reportDf: DataFrame): Boolean =
    reportDf.agg(min(col("pass"))).head().getBoolean(0)
}

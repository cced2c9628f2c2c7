package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Data-distribution diagnostics — the "is this join key going to fall
  * over at scale" report an operator library owes its users: per-key
  * cardinality stats in ONE map-side-combined pass over (key, count)
  * partials, returning a single row the driver can alert on.
  *
  * `skew_ratio` = max_n · n_keys / n_rows (hot key's multiple of the
  * mean); 1.0 is uniform, and the value is exactly the replication
  * factor at which [[RelationalOps.saltedJoin]] would level the hot
  * reducer — the report feeds the mitigation directly.
  */
object Diagnostics {

  /** Single-row skew report over `keyCol`: n_keys, n_rows, max_n,
    * hot_key (count ties → highest key), skew_ratio. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        max(struct(col("n"), col(keyCol))).getField(keyCol).as("hot_key"))
      .select(col("n_keys"), col("n_rows"), col("max_n"), col("hot_key"),
        (col("max_n").cast(DoubleType) * col("n_keys") / col("n_rows")).as("skew_ratio"))
  }

  /** Data-profiling report — one row per profiled column with row
    * count, null count, exact distinct count, and min/max rendered as
    * strings (so heterogeneous column types share one schema). The
    * generic form of the reference's coverage statistics (SURVEY §2.4
    * A6: "how many rows have a usable SIRET" is exactly a null/valid
    * profile), and the first thing a pipeline runs on a new feed.
    *
    * Scale shape: ONE pass over the table — all per-column aggregates
    * evaluate in a single hash-aggregate stage (no per-column jobs, no
    * stack/unpivot re-scan); count_distinct is the only expensive
    * member and is exact here because the profile is the oracle
    * surface — a 100 TB profile swaps it for approx_count_distinct
    * the way q46 documents. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // one narrow explode of the single aggregate row into the report
    val pairs = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(pairs: _*)).as("p")).select("p.*")
  }
}

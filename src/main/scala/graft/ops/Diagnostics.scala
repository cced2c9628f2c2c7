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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators distilled from the reference pipelines
  * (SURVEY.md §2), re-expressed as pure `DataFrame => DataFrame` /
  * `Column => Column` builders with Spark-grade (deterministic,
  * null-explicit) semantics.
  *
  * Determinism note: pandas keep-first / keep-last dedup depends on
  * physical row order (reference `dags/icpe-siretisation.py:275-277,336`);
  * here every dedup takes an explicit total ordering so results are
  * stable under any partitioning — a requirement both for the DuckDB
  * oracle and for reproducible runs on a 1000-executor cluster.
  */
object RelationalOps {

  /** A2 (`drop_duplicates(subset=keys)` keep-first) with an explicit
    * total order. One shuffle on `keys`; window stays within the
    * shuffled partition, no second exchange.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** A1 (sort by `order` then keep LAST per key,
    * `dags/icpe-siretisation.py:275-277`). */
  def keepLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order.map(_.desc))

  /** A1 alternative without a window: single hash-aggregate carrying the
    * whole row as `max(struct(orderCols ++ payload))`. Preferable at
    * scale when the key cardinality is high (partial aggregation
    * map-side combines before the shuffle; a window can't).
    * Returns one struct column `m`; caller projects fields.
    */
  def latestByAgg(df: DataFrame, keys: Seq[String], orderCols: Seq[Column], payload: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(orderCols ++ payload: _*)).as("m"))

  /** F7: three-valued dict lookup (`dags/icpe-siretisation.py:177-216`):
    * NULL → NULL, known code → label, unknown code → "" (the reference
    * logs a warning and maps to empty string).
    */
  def labelMap(c: Column, mapping: Map[String, String]): Column =
    when(c.isNull, lit(null: String))
      .otherwise(coalesce(element_at(typedLit(mapping), c), lit("")))

  /** P8: conditional coalesce (`dags/icpe-siretisation.py:248-250,287-289`):
    * replace an invalid identifier (shorter than `validLen` or NULL —
    * pandas `len(str(NaN)) == 3` makes NaN invalid too) with a candidate,
    * but only when the candidate itself is valid.
    */
  def coalesceValid(orig: Column, cand: Column, validLen: Int = 14): Column =
    when((length(orig) < validLen || orig.isNull) && (length(cand) === validLen), cand)
      .otherwise(orig)

  /** P6: the validity predicate used by the coverage stats
    * (`dags/icpe-siretisation.py:241,256,283,297`). */
  def isValidId(c: Column, validLen: Int = 14): Column =
    length(c) === validLen

  /** J5: membership flag via left join against a key set
    * (`dags/publish-open-data.py:75-79`) — semantically a left-semi
    * marker; implemented as a broadcastable left join on the deduped key
    * column so the flag column survives.
    */
  def membershipFlag(df: DataFrame, keyCol: String, members: DataFrame,
                     memberKey: String, flagName: String, flagValue: String = "oui"): DataFrame = {
    val m = members.select(col(memberKey).as(keyCol)).distinct()
      .withColumn(flagName, lit(flagValue))
    df.join(broadcast(m), Seq(keyCol), "left")
  }

  /** F4: postal-code extraction (`dags/icpe-siretisation.py:236`).
    * pandas `str.extract` yields NaN on no-match; Spark yields "" — wrap
    * with nullif for parity.
    */
  def extractPostalCode(address: Column): Column =
    nullif(regexp_extract(address, "(\\d{5}) ", 1), lit(""))

  /** F1+F3: separator concat where pandas NaN-propagates then fills ""
    * (`dags/icpe-siretisation.py:153-154`). */
  def concatOrEmpty(sep: String, cols: Column*): Column =
    coalesce(concat(cols.flatMap(c => Seq(c, lit(sep))).dropRight(1): _*), lit(""))
}

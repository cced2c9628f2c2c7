package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.RelationalOps

/** Reference-parity operator inventory (SURVEY.md §2) expressed over the
  * driver fixture tables, one query per operator row, each with a DuckDB
  * oracle.
  *
  * Numeric-determinism policy: any aggregation over doubles is routed
  * through explicit `DECIMAL` casts on BOTH the Spark and the oracle
  * side. Decimal arithmetic is exact and order-independent, so results
  * hash-match regardless of partitioning / aggregation order — double
  * sums would not, on a 32-thread local run, let alone a 1000-executor
  * cluster. The OUTPUT column is then final-cast to DOUBLE on both
  * sides: engines render the same exact decimal differently (trailing
  * zeros, scale), but convert it to the identical nearest double, so
  * the canonical-rendering hash agrees while the arithmetic stays
  * exact.
  *
  * Determinism policy: every query ends in a total `orderBy`, mirrored in
  * the oracle SQL.
  */
object ParityQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Total-order a SMALL oracle output with ONE execution of the child
    * plan. A trailing global `orderBy` plans a RangePartitioning whose
    * boundary-sampling job re-executes the entire uncached subtree —
    * measured 2× on the expensive dedup probes (q86: 10.5 s → 5.5 s).
    * One shuffle to a single partition + in-partition sort pays one
    * narrow exchange instead; the single sort task is trivial at
    * oracle-output sizes (≤ ~100k rows). The trailing sort is only the
    * driver row-compare convention — a production pipeline writes the
    * result unsorted — so collapsing its parallelism is free. Use ONLY
    * on final outputs whose cardinality is BOUNDED at any SF
    * (aggregates, top-k, capped pair lists — ≤ ~100k rows); never
    * inside an operator, and never on a row-per-input output.
    *
    * [[SortedOutOps.sortedOutWide]] is the row-per-input twin: a plain
    * parallel range sort (`orderBy`). Its boundary-sampling pass
    * re-executes only the narrow tail after the last shuffle (cheap
    * under AQE, where upstream stages are already materialized), and
    * it never funnels O(input) rows through a single task — at sf1+
    * the single-partition variant would bottleneck or OOM exactly the
    * queries whose outputs grow with the data. */
  private[queries] implicit class SortedOutOps(private val df: DataFrame) {
    def sortedOut(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
    def sortedOut(first: String, rest: String*): DataFrame =
      sortedOut((first +: rest).map(col): _*)
    def sortedOutWide(cols: Column*): DataFrame =
      df.orderBy(cols: _*)
    def sortedOutWide(first: String, rest: String*): DataFrame =
      sortedOutWide((first +: rest).map(col): _*)
  }

  private[queries] def sortedOut(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  private def d184(c: Column) = c.cast(DecimalType(18, 4))
  /** Final output cast: exact decimal → double (see policy above). */
  private def dbl(c: Column) = c.cast(DoubleType)

  // ---------------------------------------------------------------- A4/A5/agg
  /** TPC-H Q1-shaped scan+filter+hash-aggregate (SURVEY §2.4 A4-A6).
    *
    * Output convention deviates from the engine-wide DECIMAL→DOUBLE
    * policy: at sf0.1 these sums pass ~15 significant digits, where
    * the two engines' decimal→double conversions differ by 1 ulp
    * (DuckDB divides the int128 by 10^scale in floating point, Spark
    * rounds the BigDecimal once). The sums are therefore emitted as
    * the exact decimal's canonical fixed-scale STRING — bit-identical
    * text on both engines at ANY magnitude, closing the one known
    * scale-dependent blemish (VERDICT r4 item 6). */
  private def q01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(d184(col("l_quantity"))).cast(StringType).as("sum_qty"),
        sum(d184(col("l_extendedprice"))).cast(StringType).as("sum_price"),
        sum(d184(col("l_extendedprice")) * d184(lit(1.0) - col("l_discount")))
          .cast(StringType).as("sum_disc_price"),
        count(lit(1)).as("n"))
      .sortedOut("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS sum_price,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS sum_disc_price,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ----------------------------------------------------------- P1-P6 filters
  /** Projection + prefix filter + length predicate (SURVEY §2.2 P1/P4/P6). */
  private def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .where(col("p_brand").startsWith("Brand#1") && length(col("p_name")) > 8)
      .select("p_partkey", "p_name", "p_brand")
      .sortedOutWide("p_partkey")

  private val q02Sql =
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE p_brand LIKE 'Brand#1%' AND length(p_name) > 8
      |ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------------- Joins
  /** J1: left equi-join orders ⟕ customer. */
  private def q03(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .select(o("o_orderkey"), o("o_custkey"), c("c_name"), c("c_mktsegment"))
      .sortedOutWide("o_orderkey")
  }

  private val q03Sql =
    """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** J4: inner equi-join with a pushed-down dimension filter; the part
    * side is broadcast (small dim) so the fact table never shuffles. */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val p  = t(s, d, "part").where(col("p_type") === "PROMO")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .select(li("l_orderkey"), li("l_linenumber"), p("p_name"), li("l_quantity"))
      .sortedOutWide("l_orderkey", "l_linenumber", "p_name", "l_quantity")
  }

  // (l_orderkey, l_linenumber) is not unique in the fixture data — the
  // ORDER BY covers every output column so the row sequence is total.
  private val q04Sql =
    """SELECT l_orderkey, l_linenumber, p_name, l_quantity
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'PROMO'
      |ORDER BY l_orderkey, l_linenumber, p_name, l_quantity""".stripMargin

  /** Left-semi membership (SURVEY §2.3 J5-in-spirit). */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").where(col("o_totalprice") > 150000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .sortedOutWide("c_custkey")
  }

  private val q05Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti (NOT EXISTS). */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .sortedOutWide("c_custkey")
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------- Dedup
  /** A2: deterministic keep-FIRST per key (reference `drop_duplicates`,
    * `dags/icpe-siretisation.py:336`) — first order per customer by
    * (orderdate, orderkey). */
  private def q07(s: SparkSession, d: String): DataFrame =
    RelationalOps.keepFirst(t(s, d, "orders"), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .sortedOutWide("o_custkey")

  private val q07Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      | FROM orders) WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** A1: sort+keep-LAST per key (`dags/icpe-siretisation.py:275-277`),
    * implemented shuffle-lean as max(struct(...)) — partial aggregation
    * combines map-side, unlike a window. */
  private def q08(s: SparkSession, d: String): DataFrame =
    RelationalOps.latestByAgg(t(s, d, "orders"), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")), Nil)
      .select(col("o_custkey"),
        col("m.o_orderkey").as("last_orderkey"),
        col("m.o_orderdate").cast(DateType).as("last_date"))
      .sortedOutWide("o_custkey")

  private val q08Sql =
    """SELECT o_custkey, o_orderkey AS last_orderkey, CAST(o_orderdate AS DATE) AS last_date
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------- A5 stats
  /** Count-distinct with predicate (`dags/icpe-siretisation.py:241`). */
  private def q09(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .where(col("c_acctbal") > 0)
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_custkey")).as("n_cust"),
           count(lit(1)).as("n_rows"))
      .sortedOut("c_mktsegment")

  private val q09Sql =
    """SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust, count(*) AS n_rows
      |FROM customer WHERE c_acctbal > 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------- P8 conditional coalesce
  /** P8: replace invalid value with a valid candidate
    * (`dags/icpe-siretisation.py:248-250`). NULLIF manufactures the
    * nulls so the NULL-is-invalid branch is exercised on fixture data. */
  private def q10(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val orig = nullif(col("o_orderpriority"), lit("1-URGENT"))
    val cand = concat(col("o_orderstatus"), lit("-FIXED"))
    o.select(col("o_orderkey"),
        RelationalOps.coalesceValid(orig, cand, validLen = 7).as("priority_fixed"))
      .sortedOutWide("o_orderkey")
  }

  private val q10Sql =
    """SELECT o_orderkey,
      | CASE WHEN (length(NULLIF(o_orderpriority,'1-URGENT')) < 7 OR NULLIF(o_orderpriority,'1-URGENT') IS NULL)
      |        AND length(o_orderstatus || '-FIXED') = 7
      |      THEN o_orderstatus || '-FIXED' ELSE NULLIF(o_orderpriority,'1-URGENT') END AS priority_fixed
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------------- F7 dict map
  /** F7: three-valued code→label mapping (`dags/icpe-siretisation.py:177-216`):
    * NULL→NULL, known→label, unknown→''. */
  private def q11(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"),
        RelationalOps.labelMap(col("c_mktsegment"),
          Map("BUILDING" -> "B", "AUTOMOBILE" -> "A", "MACHINERY" -> "M")).as("seg_code"))
      .sortedOutWide("c_custkey")

  private val q11Sql =
    """SELECT c_custkey,
      | CASE WHEN c_mktsegment IS NULL THEN NULL
      |      WHEN c_mktsegment = 'BUILDING' THEN 'B'
      |      WHEN c_mktsegment = 'AUTOMOBILE' THEN 'A'
      |      WHEN c_mktsegment = 'MACHINERY' THEN 'M'
      |      ELSE '' END AS seg_code
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------- F4 regex extract
  private def q12(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("cust_no"))
      .sortedOutWide("c_custkey")

  private val q12Sql =
    """SELECT c_custkey, regexp_extract(c_name, 'Customer#(\d+)', 1) AS cust_no
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------ F1/F3 concat+fill
  private def q13(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"),
        RelationalOps.concatOrEmpty("_", col("p_brand"), col("p_type")).as("brand_type"))
      .sortedOutWide("p_partkey")

  private val q13Sql =
    """SELECT p_partkey, COALESCE(p_brand || '_' || p_type, '') AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // --------------------------------------------------------- F8/F9 dates
  private def q14(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"),
           dbl(sum(d184(col("o_totalprice")))).as("sum_price"))
      .sortedOut("yr", "mo")

  private val q14Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo,
      | count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ Windows
  /** Ranking window: top-3 orders per customer (SURVEY §2.5). */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= 3)
      .sortedOutWide("o_custkey", "rn")
  }

  private val q15Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running-sum frame window (rowsBetween) per supplier.
    * `(l_orderkey, l_linenumber)` is NOT unique in the fixture data, so
    * the window order adds `l_quantity` — remaining ties are rows whose
    * summed value is identical, making the running sum well-defined —
    * and the output order appends `running_qty` for a deterministic
    * row sequence. */
  private def q16(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        dbl(sum(d184(col("l_quantity"))).over(w)).as("running_qty"))
      .sortedOutWide("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
  }

  private val q16Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
      |   OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin

  // ------------------------------------------------------------- Set ops
  private def q17(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    val a = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
    val b = o.where(col("o_totalprice") > 200000).select(col("o_custkey").as("k"))
    val e = o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    a.union(b).distinct().except(e).sortedOut("k")
  }

  private val q17Sql =
    """SELECT k FROM (
      | SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
      | EXCEPT
      | SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY k""".stripMargin

  // ------------------------------------------------------------ Top-k
  private def q18(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .limit(10)

  private val q18Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ------------------------------------------------------------ Rollup
  private def q19(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           dbl(sum(d184(col("l_quantity")))).as("sum_qty"))
      .sortedOut(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q19Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------------- JSON
  /** JSON props extraction on the events table (FIXTURES.md §B). */
  private def q20(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .sortedOut("event_type")

  private val q20Sql =
    """SELECT event_type,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------- Time-bucketed event rollup
  /** Tumbling-window (hourly) event aggregation — the batch twin of the
    * Structured Streaming job in graft.streaming.EventsStream; same
    * transform lifts to readStream+watermark unchanged. */
  private def q21(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour_ts"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           dbl(sum(d184(col("value")))).as("sum_value"))
      .sortedOutWide("hour_ts", "event_type")

  private val q21Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_ts, event_type,
      | count(*) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------- Flagship multi-join
  /** TPC-H Q5-shaped star join: revenue per supplier nation in one
    * region. Dimensions (region, nation, supplier) broadcast; only
    * customer⨝orders⨝lineitem shuffle, and AQE can re-plan at runtime. */
  private def q22(s: SparkSession, d: String): DataFrame = {
    val li  = t(s, d, "lineitem")
    val o   = t(s, d, "orders")
    val c   = t(s, d, "customer")
    val sup = t(s, d, "supplier")
    val n   = t(s, d, "nation")
    val r   = t(s, d, "region").where(col("r_name") === "ASIA")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dbl(sum(d184(col("l_extendedprice")) * d184(lit(1.0) - col("l_discount")))).as("revenue"),
           count(lit(1)).as("n_lines"))
      .sortedOut("n_name")
  }

  private val q22Sql =
    """SELECT n_name,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      | count(*) AS n_lines
      |FROM lineitem
      | JOIN orders   ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation   ON s_nationkey = n_nationkey
      | JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** (name, query, oracle SQL) triples; oracle None ⇒ rows-only check. */
  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q01_agg_sum",            q01 _, Some(q01Sql)),
    ("q02_filter_project",     q02 _, Some(q02Sql)),
    ("q03_join_left",          q03 _, Some(q03Sql)),
    ("q04_join_inner_bcast",   q04 _, Some(q04Sql)),
    ("q05_semi_join",          q05 _, Some(q05Sql)),
    ("q06_anti_join",          q06 _, Some(q06Sql)),
    ("q07_dedup_keep_first",   q07 _, Some(q07Sql)),
    ("q08_latest_per_key",     q08 _, Some(q08Sql)),
    ("q09_count_distinct",     q09 _, Some(q09Sql)),
    ("q10_conditional_coalesce", q10 _, Some(q10Sql)),
    ("q11_dict_map",           q11 _, Some(q11Sql)),
    ("q12_regex_extract",      q12 _, Some(q12Sql)),
    ("q13_concat_fill",        q13 _, Some(q13Sql)),
    ("q14_date_parts_agg",     q14 _, Some(q14Sql)),
    ("q15_window_rank",        q15 _, Some(q15Sql)),
    ("q16_window_running_sum", q16 _, Some(q16Sql)),
    ("q17_set_ops",            q17 _, Some(q17Sql)),
    ("q18_topk",               q18 _, Some(q18Sql)),
    ("q19_rollup",             q19 _, Some(q19Sql)),
    ("q20_json_extract_agg",   q20 _, Some(q20Sql)),
    ("q21_events_hourly",      q21 _, Some(q21Sql)),
    ("q22_star_join_revenue",  q22 _, Some(q22Sql)))
}

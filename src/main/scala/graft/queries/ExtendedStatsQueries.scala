package graft.queries

import graft.ops.TrackedCache.TrackOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.RelationalOps
import graft.sim.IvfIndex
import graft.text.TextFunctions

/** Extended coverage, statistics wave (q238-q273 range): Gini, sign
  * test, FD discovery, k-core, advisors, Mann-Kendall/Theil-Sen - split
  * out of the former ExtendedQueries mega-file (VERDICT r11 #6); query
  * names, bodies, and oracles are unchanged.
  */
object ExtendedStatsQueries {
  import ParityQueries.{Q, SortedOutOps}

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  private def d184(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
  /** Final output cast: exact decimal -> double (ParityQueries policy). */
  private def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  // ------- Gini concentration of customer spend (q238)
  /** The inequality scalar behind q171's Lorenz curve and q235's HHI:
    * Gini = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over per-customer spend sorted
    * ascending — "how unevenly is revenue concentrated across the
    * customer base", the one-number answer a data buyer compares
    * across corpora. The rank i comes from
    * [[RelationalOps.globalRowNumber]] (range-partitioned — never a
    * single-partition window) under the total order (cents, custkey);
    * every product is DECIMAL(38,0), the numerator exports as
    * canonical digits, and gini_ppm is one exact integer division
    * (q226 policy).
    *
    * Scale shape: one customer-keyed aggregate, the distributed rank,
    * one map-side-combinable fold; totals ride a 1-row broadcast. */
  private def q238(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val spend = t(s, d, "orders")
      .groupBy(col("o_custkey").as("c"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("cents"))
    val ranked = RelationalOps.globalRowNumber(
      spend, Seq(col("cents").asc, col("c").asc), "i")
    val tot = spend.agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
    ranked.crossJoin(broadcast(tot))
      .select(col("n"), col("total_cents"),
        (dec(col("i") * 2 - col("n") - 1) * dec(col("cents"))).as("term"))
      .groupBy()
      .agg(max(col("n")).as("n_customers"),
        max(col("total_cents")).as("total_cents"),
        sum(col("term")).cast(DecimalType(38, 0)).as("gnum"))
      .select(col("n_customers"), col("total_cents"),
        col("gnum").cast(StringType).as("gini_num"),
        expr("CAST(gnum * 1000000 div (CAST(n_customers AS DECIMAL(38,0)) * total_cents) AS BIGINT)")
          .as("gini_ppm"))
  }

  private val q238Sql =
    """WITH s AS (SELECT o_custkey AS c,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents, c) AS BIGINT) AS i FROM s),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cents) AS BIGINT) AS total_cents FROM s)
      |SELECT n AS n_customers, total_cents,
      |  CAST(sum(CAST(i * 2 - n - 1 AS HUGEINT) * cents) AS VARCHAR) AS gini_num,
      |  CAST(sum(CAST(i * 2 - n - 1 AS HUGEINT) * cents) * 1000000 //
      |    (CAST(n AS HUGEINT) * total_cents) AS BIGINT) AS gini_ppm
      |FROM r CROSS JOIN t GROUP BY n, total_cents""".stripMargin

  // ------- time-weighted exposure per user, trapezoid-exact (q239)
  /** The time-series INTEGRAL operator: a user's average event value
    * weighted by how LONG it stood, not how often it was sampled —
    * ∫v dt by the trapezoid rule over the (ts, event_id)-ordered
    * sequence. The un-weighted mean over-counts burst periods; the
    * time-weighted one is what billing/exposure/risk pipelines
    * integrate. Kept exact: 2·∫v dt = Σ (vᵢ + vᵢ₊₁)·Δtᵢ in
    * cents·ms DECIMAL(38,0), exported as canonical digits, plus one
    * exact integer division to cents (the mean value over the span).
    *
    * Scale shape: one user-keyed shuffle; lead() rides the same
    * per-user sort (partitioned window — bounded per key); the fold
    * is map-side-combinable. */
  private def q239(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val e = Tables.events(s, d).select(col("user_id").as("u"),
      unix_millis(col("ts")).as("ms"), col("event_id").as("eid"),
      round(col("value") * 100).cast(LongType).as("cents"))
    val w = Window.partitionBy("u").orderBy(col("ms"), col("eid"))
    e.withColumn("nms", lead(col("ms"), 1).over(w))
      .withColumn("ncents", lead(col("cents"), 1).over(w))
      .groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ms")) - min(col("ms"))).as("span_ms"),
        coalesce(sum(when(col("nms").isNotNull,
          dec(col("cents") + col("ncents")) * dec(col("nms") - col("ms")))),
          lit(0).cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("num2"))
      .select(col("user_id"), col("n_events"), col("span_ms"),
        col("num2").cast(StringType).as("twa_num2"),
        when(col("span_ms") > 0,
          expr("CAST(num2 div (2 * span_ms) AS BIGINT)")).as("twa_cents"))
      .sortedOut("user_id")
  }

  private val q239Sql =
    """WITH e AS (SELECT user_id AS u, epoch_ms(ts) AS ms, event_id AS eid,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |l AS (SELECT u, ms, cents,
      |    lead(ms) OVER w AS nms, lead(cents) OVER w AS ncents
      |  FROM e WINDOW w AS (PARTITION BY u ORDER BY ms, eid)),
      |g AS (SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(max(ms) - min(ms) AS BIGINT) AS span_ms,
      |    coalesce(sum(CASE WHEN nms IS NOT NULL
      |      THEN CAST(cents + ncents AS HUGEINT) * (nms - ms) END), 0) AS num2
      |  FROM l GROUP BY 1)
      |SELECT user_id, n_events, span_ms,
      |  CAST(num2 AS VARCHAR) AS twa_num2,
      |  CASE WHEN span_ms > 0 THEN CAST(num2 // (2 * span_ms) AS BIGINT) END AS twa_cents
      |FROM g ORDER BY user_id""".stripMargin

  // ------- DAU / WAU / MAU active-user curve (q240)
  /** The engagement triple every event pipeline reports: per observed
    * day, distinct users that day (DAU), over the trailing 7 days
    * (WAU), and the trailing 30 (MAU), plus stickiness = DAU/MAU in
    * exact ppm. Sliding distinct counts canNOT be window-aggregated
    * (distinct isn't subtractable); the exact formulation explodes
    * each (day, user) into the windows it serves — ≤ 30 rows per
    * distinct (day, user), a bounded fan-out — then counts distinct
    * per target day. Only OBSERVED days report (an event-less day has
    * no row, q237's census covers those).
    *
    * Scale shape: (day, user) distinct collapse first (map-side), the
    * 30× explode rides on that reduced frame, and the per-day
    * distinct is one keyed aggregate — never a corpus-sized state. */
  private def q240(s: SparkSession, d: String): DataFrame = {
    val du = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id").as("u"))
      .distinct().persistT
    val days = du.select("day").distinct()
    def windowed(len: Int, out: String): DataFrame = du
      .select(col("u"), explode(expr(s"sequence(0, ${len - 1})")).as("o"), col("day"))
      .select(col("u"), date_add(col("day"), col("o")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(countDistinct(col("u")).as(out))
    days
      .join(du.groupBy("day").agg(countDistinct(col("u")).as("dau")), Seq("day"))
      .join(windowed(7, "wau"), Seq("day"))
      .join(windowed(30, "mau"), Seq("day"))
      .withColumn("stickiness_ppm", expr("dau * 1000000 div mau"))
      .select(col("day").cast(StringType).as("day"), col("dau"),
        col("wau"), col("mau"), col("stickiness_ppm"))
      .sortedOut("day")
  }

  private val q240Sql =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events),
      |days AS (SELECT DISTINCT day FROM du)
      |SELECT CAST(d.day AS VARCHAR) AS day,
      |  CAST((SELECT count(DISTINCT u) FROM du WHERE du.day = d.day) AS BIGINT) AS dau,
      |  CAST((SELECT count(DISTINCT u) FROM du
      |        WHERE du.day BETWEEN d.day - 6 AND d.day) AS BIGINT) AS wau,
      |  CAST((SELECT count(DISTINCT u) FROM du
      |        WHERE du.day BETWEEN d.day - 29 AND d.day) AS BIGINT) AS mau,
      |  CAST((SELECT count(DISTINCT u) FROM du WHERE du.day = d.day) * 1000000 //
      |       (SELECT count(DISTINCT u) FROM du
      |        WHERE du.day BETWEEN d.day - 29 AND d.day) AS BIGINT) AS stickiness_ppm
      |FROM days d ORDER BY day""".stripMargin

  // ------- behavioral bot screen over the event stream (q243)
  /** The "is this user a crawler" gate a behavioral corpus runs before
    * training on it: per user, event rate against wall-clock span
    * (milli-events/hour, exact integer), error share and night-hour
    * share (0-5h UTC) in ppm, and the deterministic flag — sustained
    * rate over 60/h, or error share over 30%, or >80% night activity
    * with ≥ 50 events. Every metric is integer arithmetic on counts
    * and epoch-ms (q229's calendar discipline), so the flags are
    * bit-portable — a screen that flags different users on different
    * engines is worse than none.
    *
    * Scale shape: ONE user-keyed map-side-combinable aggregate; no
    * window, no second pass. */
  private def q243(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id").as("u"),
      unix_millis(col("ts")).as("ms"),
      col("event_type").as("et"), hour(col("ts")).as("hh"))
    e.groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ms")) - min(col("ms"))).as("span_ms"),
        sum(when(col("et") === "error", 1L).otherwise(0L)).as("n_error"),
        sum(when(col("hh") < 6, 1L).otherwise(0L)).as("n_night"))
      .withColumn("rate_milli_per_hour",
        when(col("span_ms") > 0,
          expr("n_events * 3600000 * 1000 div span_ms")))
      .withColumn("err_ppm", expr("n_error * 1000000 div n_events"))
      .withColumn("night_ppm", expr("n_night * 1000000 div n_events"))
      .withColumn("is_bot",
        coalesce(col("rate_milli_per_hour") > 60000L, lit(false)) ||
          col("err_ppm") > 300000L ||
          (col("night_ppm") > 800000L && col("n_events") >= 50L))
      .select("user_id", "n_events", "span_ms", "rate_milli_per_hour",
        "err_ppm", "night_ppm", "is_bot")
      .sortedOut("user_id")
  }

  private val q243Sql =
    """WITH g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS span_ms,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |    CAST(sum(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_night
      |  FROM events GROUP BY 1),
      |m AS (SELECT user_id, n_events, span_ms,
      |    CASE WHEN span_ms > 0
      |      THEN CAST(n_events * 3600000 * 1000 // span_ms AS BIGINT) END AS rate_milli_per_hour,
      |    CAST(n_error * 1000000 // n_events AS BIGINT) AS err_ppm,
      |    CAST(n_night * 1000000 // n_events AS BIGINT) AS night_ppm
      |  FROM g)
      |SELECT user_id, n_events, span_ms, rate_milli_per_hour, err_ppm, night_ppm,
      |  coalesce(rate_milli_per_hour > 60000, false) OR err_ppm > 300000
      |    OR (night_ppm > 800000 AND n_events >= 50) AS is_bot
      |FROM m ORDER BY user_id""".stripMargin

  // ------- exact paired sign test on daily volumes (q244)
  /** The DISTRIBUTION-FREE drift test next to CUSUM (q218) and KS
    * (q213): per event type, pair day i of the first half of the
    * calendar with day i+h of the second half and ask whether volumes
    * systematically rose — S⁺ out of m non-tied pairs, with the EXACT
    * two-sided binomial tail 2·Σ_{k≥max(S⁺,m−S⁺)} C(m,k) / 2^m in ppm.
    * No normal approximation: m ≤ 45 here, where the z-approx a
    * textbook reaches for is visibly wrong. The binomial coefficients
    * come from the integral recurrence C(m,k) = C(m,k−1)(m−k+1)/k
    * folded inside ONE row-level `aggregate` HOF (m ≤ 45 ⇒ C < 2^43,
    * BIGINT-exact; the division is exact at every step by construction)
    * — the oracle replays the identical recurrence as a recursive CTE.
    *
    * Scale shape: one (type, day) count aggregate, a |T|·n_days
    * calendar spine (tiny, q237's pattern), one broadcast self-pair
    * join on the spine, one final per-type fold. No windows. */
  private def q244(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type").as("et"),
      to_date(col("ts")).as("day"))
    val span = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("d0"),
        (datediff(col("d1"), col("d0")) + 1).cast(LongType).as("n_days"))
      .withColumn("h", expr("n_days div 2"))
    val spine = e.select(col("et")).distinct()
      .crossJoin(broadcast(span))
      .select(col("et"), col("n_days"), col("h"),
        explode(sequence(lit(0L), col("n_days") - 1)).as("i"))
    val daily = e.crossJoin(broadcast(span.select(col("d0"))))
      .groupBy(col("et"), datediff(col("day"), col("d0")).cast(LongType).as("i"))
      .agg(count(lit(1)).as("c"))
    val idx = spine.join(daily, Seq("et", "i"), "left_outer")
      .select(col("et"), col("i"), col("n_days"), col("h"),
        coalesce(col("c"), lit(0L)).as("c"))
    val paired = idx.where(col("i") < col("h")).as("a")
      .join(idx.select(col("et"), col("i"), col("c").as("c2")).as("b"),
        col("a.et") === col("b.et") && col("b.i") === col("a.i") + col("a.h"))
      .select(col("a.et").as("et"), col("a.n_days").as("n_days"),
        col("a.c").as("c1"), col("c2"))
    paired.groupBy(col("et").as("event_type"))
      .agg(max(col("n_days")).as("n_days"),
        sum(when(col("c2") =!= col("c1"), 1L).otherwise(0L)).as("m_pairs"),
        sum(when(col("c2") > col("c1"), 1L).otherwise(0L)).as("s_plus"))
      .withColumn("k_big", greatest(col("s_plus"), col("m_pairs") - col("s_plus")))
      .withColumn("tail_num", expr(
        """CASE WHEN m_pairs = 0 THEN CAST(NULL AS BIGINT) ELSE
          |aggregate(sequence(CAST(1 AS BIGINT), m_pairs),
          |  named_struct('c', CAST(1 AS BIGINT), 's', CAST(0 AS BIGINT)),
          |  (acc, k) -> named_struct(
          |    'c', acc.c * (m_pairs - k + 1) div k,
          |    's', acc.s + CASE WHEN k >= k_big
          |           THEN acc.c * (m_pairs - k + 1) div k ELSE CAST(0 AS BIGINT) END),
          |  acc -> acc.s) END""".stripMargin))
      .withColumn("p2_ppm", expr(
        // 2·tail_num·10⁶ peaks ~3.5e19 > Long.Max under the null
        // hypothesis (m≈45, s⁺≈m/2 → tail ~2^44) — clear the product
        // through DECIMAL(38,0) before the floor-div (q248 discipline;
        // ADVICE r10). The quotient is ≤ 2·10⁶, BIGINT-safe.
        """CASE WHEN m_pairs > 0 THEN least(CAST(1000000 AS BIGINT),
          |  CAST(CAST(tail_num AS DECIMAL(38,0)) * 2000000
          |       div shiftleft(CAST(1 AS BIGINT), CAST(m_pairs AS INT)) AS BIGINT))
          |END""".stripMargin))
      .select("event_type", "n_days", "m_pairs", "s_plus", "tail_num", "p2_ppm")
      .sortedOut("event_type")
  }

  private val q244Sql =
    """WITH RECURSIVE e AS (SELECT event_type AS et, CAST(ts AS DATE) AS day FROM events),
      |sp AS (SELECT min(day) AS d0,
      |    CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS n_days,
      |    CAST((date_diff('day', min(day), max(day)) + 1) // 2 AS BIGINT) AS h
      |  FROM e),
      |cal AS (SELECT et, CAST(x.i AS BIGINT) AS i FROM (SELECT DISTINCT et FROM e), sp,
      |        (SELECT unnest(range(0, (SELECT n_days FROM sp))) AS i) x),
      |dc AS (SELECT et, CAST(date_diff('day', (SELECT d0 FROM sp), day) AS BIGINT) AS i,
      |    CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
      |idx AS (SELECT cal.et, cal.i, coalesce(dc.c, 0) AS c
      |  FROM cal LEFT JOIN dc USING (et, i)),
      |p AS (SELECT a.et, a.c AS c1, b.c AS c2 FROM idx a JOIN idx b
      |  ON a.et = b.et AND b.i = a.i + (SELECT h FROM sp)
      |  WHERE a.i < (SELECT h FROM sp)),
      |st AS (SELECT et, (SELECT n_days FROM sp) AS n_days,
      |    CAST(sum(CASE WHEN c2 <> c1 THEN 1 ELSE 0 END) AS BIGINT) AS m_pairs,
      |    CAST(sum(CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS BIGINT) AS s_plus
      |  FROM p GROUP BY 1),
      |par AS (SELECT et, n_days, m_pairs, s_plus,
      |    greatest(s_plus, m_pairs - s_plus) AS kb FROM st),
      |b AS (SELECT et, m_pairs AS m, kb, CAST(0 AS BIGINT) AS kk,
      |    CAST(1 AS BIGINT) AS c, CAST(0 AS BIGINT) AS ssum
      |  FROM par WHERE m_pairs > 0
      |  UNION ALL SELECT et, m, kb, kk + 1, c * (m - kk) // (kk + 1),
      |    ssum + CASE WHEN kk + 1 >= kb THEN c * (m - kk) // (kk + 1) ELSE 0 END
      |  FROM b WHERE kk < m),
      |tl AS (SELECT et, ssum AS tail_num FROM b WHERE kk = m)
      |SELECT par.et AS event_type, n_days, m_pairs, s_plus, tl.tail_num,
      |  CASE WHEN m_pairs > 0 THEN least(1000000, CAST(
      |    CAST(tl.tail_num AS HUGEINT) * 2000000 // (CAST(1 AS BIGINT) << m_pairs)
      |    AS BIGINT)) END AS p2_ppm
      |FROM par LEFT JOIN tl USING (et) ORDER BY event_type""".stripMargin

  // ------- functional-dependency audit (q247)
  /** Schema-profiling beyond per-column stats (q198) and row-level
    * expectations (q108): does column A DETERMINE column B? For each
    * declared candidate (the Metanome-style check a warehouse runs on
    * arrival), count determinant keys and keys carrying >1 distinct
    * dependent value — zero violating keys ⇔ the FD holds. The
    * candidate list deliberately mixes true keys (o_orderkey→o_custkey),
    * plausible-but-false FDs (l_partkey→l_suppkey), and the fixture's
    * known many-to-many (source→lang), so both verdicts are exercised.
    *
    * Scale shape: per candidate ONE two-phase aggregate (map-side
    * partial count-distinct per determinant, then a tiny rollup) —
    * no joins, no windows; candidates run independently and union. */
  private def q247(s: SparkSession, d: String): DataFrame = {
    def fd(df: DataFrame, table: String, det: String, dep: String): DataFrame =
      df.groupBy(col(det)).agg(countDistinct(col(dep)).as("ndep"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("ndep") > 1, 1L).otherwise(0L)).as("n_violating_keys"))
        .select(lit(table).as("table_name"), lit(det).as("determinant"),
          lit(dep).as("dependent"), col("n_keys"), col("n_violating_keys"),
          (col("n_violating_keys") === 0L).as("fd_holds"))
    val cands = Seq(
      fd(t(s, d, "orders"), "orders", "o_orderkey", "o_custkey"),
      fd(t(s, d, "lineitem"), "lineitem", "l_orderkey", "l_suppkey"),
      fd(t(s, d, "lineitem"), "lineitem", "l_partkey", "l_suppkey"),
      fd(t(s, d, "customer"), "customer", "c_custkey", "c_nationkey"),
      fd(Tables.documents(s, d), "documents", "source", "lang"),
      fd(Tables.documents(s, d), "documents", "doc_id", "lang"))
    cands.reduce(_ unionByName _).sortedOut("table_name", "determinant", "dependent")
  }

  private val q247Sql = {
    def one(table: String, det: String, dep: String) =
      s"""SELECT '$table' AS table_name, '$det' AS determinant, '$dep' AS dependent,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
         |  sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
         |FROM (SELECT $det, count(DISTINCT $dep) AS ndep FROM $table GROUP BY 1)""".stripMargin
    Seq(
      one("orders", "o_orderkey", "o_custkey"),
      one("lineitem", "l_orderkey", "l_suppkey"),
      one("lineitem", "l_partkey", "l_suppkey"),
      one("customer", "c_custkey", "c_nationkey"),
      one("documents", "source", "lang"),
      one("documents", "doc_id", "lang"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, determinant, dependent")
  }

  // ------- event-order violation audit (q249)
  /** The CAUSAL-SCHEMA gate on behavioral data: the product's declared
    * partial order (signup precedes everything; view → click →
    * purchase) checked against each user's FIRST occurrence of each
    * type. A violating user (first purchase before first view) is
    * evidence of clock skew, backfill, or bot traffic — counted per
    * declared edge in exact ppm. Strict inequality: equal first
    * timestamps are NOT violations (same-batch ingestion is legal).
    *
    * Scale shape: one (user, type) min-aggregate, then a broadcast of
    * the 5-row edge list against a self-join keyed on user_id — the
    * self-join co-partitions on the aggregate's own keying, no extra
    * shuffle of the big side. */
  private def q249(s: SparkSession, d: String): DataFrame = {
    val firsts = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_millis(col("ts"))).as("first_ms"))
    val edges = Seq(
      ("signup", "view"), ("signup", "click"), ("signup", "purchase"),
      ("view", "click"), ("click", "purchase"))
    val edgeDf = {
      import s.implicits._
      edges.toDF("ante", "post")
    }
    firsts.as("a")
      .join(firsts.as("b"), col("a.user_id") === col("b.user_id"))
      .join(broadcast(edgeDf),
        col("a.event_type") === col("ante") && col("b.event_type") === col("post"))
      .groupBy("ante", "post")
      .agg(count(lit(1)).as("n_users_both"),
        sum(when(col("b.first_ms") < col("a.first_ms"), 1L).otherwise(0L))
          .as("n_violations"))
      .withColumn("viol_ppm", expr("n_violations * 1000000 div n_users_both"))
      .sortedOut("ante", "post")
  }

  private val q249Sql =
    """WITH f AS (SELECT user_id, event_type,
      |    CAST(epoch_ms(min(ts)) AS BIGINT) AS first_ms
      |  FROM events GROUP BY 1, 2),
      |e(ante, post) AS (VALUES ('signup', 'view'), ('signup', 'click'),
      |  ('signup', 'purchase'), ('view', 'click'), ('click', 'purchase'))
      |SELECT e.ante, e.post,
      |  CAST(count(*) AS BIGINT) AS n_users_both,
      |  CAST(sum(CASE WHEN b.first_ms < a.first_ms THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  CAST(sum(CASE WHEN b.first_ms < a.first_ms THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS viol_ppm
      |FROM f a JOIN f b ON a.user_id = b.user_id
      |JOIN e ON a.event_type = e.ante AND b.event_type = e.post
      |GROUP BY 1, 2 ORDER BY ante, post""".stripMargin

  // ------- k-core backbone of the trade graph (q250)
  /** [[graft.ops.Graph.kCore]] on the customer–supplier REPEAT-trade
    * graph (an edge only where the pair traded ≥ 2 lineitems — the
    * one-off purchases that would make every node trivially deep are
    * noise, not structure): for k ∈ {2, 4}, the surviving cohesive
    * backbone — nodes, split by side, and edges. Components (q48) say
    * "connected", LPA (q183) says "same neighborhood"; the k-core says
    * "mutually densely connected", the spam-clique / load-bearing-
    * backbone filter of link-graph curation. k=4 peels this fixture to
    * EMPTY at sf0.1 — the empty-core path is part of the contract.
    *
    * Scale shape: the fact table collapses to the ≤|C|·|S| repeat-edge
    * list once (persisted, shared by both k); each peeling round is
    * one map-side-combinable degree aggregate plus two hash joins of
    * the shrinking edge list, re-planned against a lineage cut — R
    * rounds cost R bounded shuffles, no windows, nothing on the
    * driver. The oracle unrolls 8 peeling rounds per k (idempotent
    * past the fixpoint; the engine iterates to convergence). */
  private def q250(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(10000000L)).as("b"))
      .agg(count(lit(1)).as("m"))
      .where(col("m") >= 2)
      .select(col("a"), col("b"))
      .persistT
    val out = Seq(2, 4).map { k =>
      val core = graft.ops.Graph.kCore(edges, k)
      val nodes = core.select(col("a").as("node"))
        .unionAll(core.select(col("b").as("node"))).distinct()
      nodes.agg(
          count(lit(1)).as("n_core_nodes"),
          coalesce(sum(when(col("node") < 10000000L, 1L).otherwise(0L)),
            lit(0L)).as("n_core_custs"),
          coalesce(sum(when(col("node") >= 10000000L, 1L).otherwise(0L)),
            lit(0L)).as("n_core_supps"))
        .crossJoin(broadcast(core.agg(count(lit(1)).as("n_core_edges"))))
        .select(lit(k).as("k"), col("n_core_nodes"), col("n_core_custs"),
          col("n_core_supps"), col("n_core_edges"))
    }.reduce(_ unionByName _).sortedOut("k")
    out
  }

  /** Every round CTE is MATERIALIZED: each round references its
    * predecessor 3× (degree twice, filter once), so inlined CTEs would
    * re-expand the chain 3^8-fold. */
  private val q250Sql = {
    val rounds = 8
    def peel(k: Int, r: Int): String =
      s"""d${k}_$r AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM e${k}_${r - 1}
         |    UNION ALL SELECT b FROM e${k}_${r - 1}) u GROUP BY node),
         |k${k}_$r AS (SELECT node FROM d${k}_$r WHERE deg >= $k),
         |e${k}_$r AS MATERIALIZED (SELECT e.a, e.b FROM e${k}_${r - 1} e
         |  JOIN k${k}_$r x ON e.a = x.node
         |  JOIN k${k}_$r y ON e.b = y.node)""".stripMargin
    val chains = Seq(2, 4).map { k =>
      (s"e${k}_0 AS (SELECT a, b FROM e0)" +:
        (1 to rounds).map(r => peel(k, r))).mkString(",\n")
    }.mkString(",\n")
    def sel(k: Int): String =
      s"""SELECT CAST($k AS INTEGER) AS k, ns.n_core_nodes, ns.n_core_custs,
         |  ns.n_core_supps, es.n_core_edges
         |FROM (SELECT CAST(count(*) AS BIGINT) AS n_core_nodes,
         |        CAST(coalesce(sum(CASE WHEN node < 10000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_core_custs,
         |        CAST(coalesce(sum(CASE WHEN node >= 10000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_core_supps
         |      FROM (SELECT DISTINCT node FROM (
         |        SELECT a AS node FROM e${k}_$rounds UNION ALL SELECT b FROM e${k}_$rounds) u) v) ns
         |CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_core_edges FROM e${k}_$rounds) es""".stripMargin
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT a, b FROM (
       |    SELECT o.o_custkey AS a, l.l_suppkey + 10000000 AS b,
       |           count(*) AS m
       |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |    GROUP BY 1, 2) g WHERE m >= 2),
       |$chains
       |${sel(2)}
       |UNION ALL
       |${sel(4)}
       |ORDER BY k""".stripMargin
  }

  // ------- multi-touch attribution model panel (q251)
  /** CHANNEL-level attribution next to q42's row-level last-click
    * as-of join: every purchase credits its 3-day-lookback touch set
    * (signup/view/click strictly before the purchase) under THREE
    * models at once — first-touch, last-touch, and linear — so the
    * divergence between models is itself the output. Linear credit is
    * exact integer ppm: each touch gets 1e6 div n, the remainder goes
    * to the LAST touch (deterministic), so credit mass conserves to
    * exactly n_purchases·1e6 across channels; purchases with an empty
    * touch window credit '(direct)' in full.
    *
    * Scale shape: ONE user-keyed hash join (purchases × touches) with
    * the range predicate applied in-join; per-user pair fan-out is
    * bounded by activity rate within the 72 h lookback, not corpus
    * size. Everything after is (purchase, channel)-grain aggregation:
    * first/last via one min/max struct agg, no windows. */
  private def q251(s: SparkSession, d: String): DataFrame = {
    val look = 259200000L // 3 days in ms
    val ev = Tables.events(s, d).select(col("event_type"), col("user_id"),
      unix_millis(col("ts")).as("ms"), col("event_id"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("p_ms"), col("event_id").as("p_id"))
      .persistT
    val tch = ev.where(col("event_type").isin("signup", "view", "click"))
      .select(col("user_id"), col("ms").as("t_ms"),
        col("event_id").as("t_id"), col("event_type").as("channel"))
    val j = p.join(tch, Seq("user_id"))
      .where(col("t_ms") < col("p_ms") && col("t_ms") >= col("p_ms") - look)
      .select(col("p_id"), col("channel"), col("t_ms"), col("t_id"))
    // (purchase, channel) counts; first/last via ordered struct min/max
    // (t_ms, t_id) is unique, so the struct order is total
    val pc = j.groupBy(col("p_id"), col("channel"))
      .agg(count(lit(1)).as("cnt")).persistT
    val tot = pc.groupBy(col("p_id")).agg(sum(col("cnt")).as("n"))
    val fl = j.groupBy(col("p_id")).agg(
      min(struct(col("t_ms"), col("t_id"), col("channel"))).as("f"),
      max(struct(col("t_ms"), col("t_id"), col("channel"))).as("l"))
    val contrib = pc.join(tot, "p_id").join(fl, "p_id")
      .withColumn("lin_unit", expr("1000000 div n"))
      .withColumn("lin_rem", expr("1000000 % n"))
      .select(col("channel"),
        when(col("channel") === col("f.channel"), 1L).otherwise(0L).as("ft"),
        when(col("channel") === col("l.channel"), 1L).otherwise(0L).as("lt"),
        (col("cnt") * col("lin_unit") +
          when(col("channel") === col("l.channel"), col("lin_rem"))
            .otherwise(0L)).as("lin"))
    val direct = p.join(pc.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .select(lit("(direct)").as("channel"), lit(1L).as("ft"),
        lit(1L).as("lt"), lit(1000000L).as("lin"))
    contrib.unionByName(direct)
      .groupBy(col("channel"))
      .agg(sum(col("ft")).as("first_touch_convs"),
        sum(col("lt")).as("last_touch_convs"),
        sum(col("lin")).as("linear_credit_ppm"))
      .sortedOut("channel")
  }

  private val q251Sql =
    """WITH ev AS (SELECT event_type, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ms, event_id FROM events),
      |p AS (SELECT user_id, ms AS p_ms, event_id AS p_id FROM ev WHERE event_type='purchase'),
      |t AS (SELECT user_id, ms AS t_ms, event_id AS t_id, event_type AS channel FROM ev
      |      WHERE event_type IN ('signup','view','click')),
      |j AS MATERIALIZED (SELECT p.p_id, t.channel, t.t_ms, t.t_id FROM p JOIN t
      |  ON p.user_id = t.user_id AND t.t_ms < p.p_ms AND t.t_ms >= p.p_ms - 259200000),
      |pc AS (SELECT p_id, channel, CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1, 2),
      |tot AS (SELECT p_id, CAST(sum(cnt) AS BIGINT) AS n FROM pc GROUP BY 1),
      |r AS (SELECT p_id, channel,
      |    row_number() OVER (PARTITION BY p_id ORDER BY t_ms ASC, t_id ASC) AS rf,
      |    row_number() OVER (PARTITION BY p_id ORDER BY t_ms DESC, t_id DESC) AS rl
      |  FROM j),
      |f AS (SELECT p_id, channel AS fch FROM r WHERE rf = 1),
      |l AS (SELECT p_id, channel AS lch FROM r WHERE rl = 1),
      |per AS (SELECT pc.p_id, pc.channel, pc.cnt, tot.n, f.fch, l.lch
      |  FROM pc JOIN tot USING (p_id) JOIN f USING (p_id) JOIN l USING (p_id)),
      |contrib AS (
      |  SELECT channel,
      |    CAST(CASE WHEN channel = fch THEN 1 ELSE 0 END AS BIGINT) AS ft,
      |    CAST(CASE WHEN channel = lch THEN 1 ELSE 0 END AS BIGINT) AS lt,
      |    CAST(cnt * (1000000 // n) + CASE WHEN channel = lch THEN 1000000 % n ELSE 0 END AS BIGINT) AS lin
      |  FROM per
      |  UNION ALL
      |  SELECT '(direct)', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1000000 AS BIGINT)
      |  FROM p WHERE p_id NOT IN (SELECT p_id FROM tot))
      |SELECT channel, CAST(sum(ft) AS BIGINT) AS first_touch_convs,
      |  CAST(sum(lt) AS BIGINT) AS last_touch_convs,
      |  CAST(sum(lin) AS BIGINT) AS linear_credit_ppm
      |FROM contrib GROUP BY 1 ORDER BY channel""".stripMargin

  // ------- engagement-decile conversion lift table (q253)
  /** The GAINS/LIFT curve of classical model evaluation, computed on
    * the behavioral fixture: users ranked by engagement (event count,
    * id-tiebroken), split into EXACT equi-depth deciles, each scored
    * for purchase conversion against the population rate — per-decile
    * lift and the cumulative capture share a targeting budget buys.
    * All ratios exact integer ppm through the q248 DECIMAL(38,0)
    * clearing discipline.
    *
    * Scale shape: one user-grain aggregate; decile assignment rides
    * [[RelationalOps.globalRowNumber]] (range-partitioned prefix scan
    * — never a single-partition ntile window, the q198 lesson); the
    * 10-row result takes its cumulative from globalRunningSum and its
    * population totals from a 1-row broadcast. */
  private def q253(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    val ranked = RelationalOps.globalRowNumber(per,
      Seq(col("n_events").desc, col("user_id").asc), "rn")
    val tot = ranked.agg(max(col("rn")).as("nu"),
      sum(col("converted")).as("conv_all"))
    val dec = ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr("CAST((rn - 1) * 10 div nu AS INT)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converters"),
        max(col("nu")).as("nu"), max(col("conv_all")).as("conv_all"))
      .withColumn("conv_ppm", expr("n_converters * 1000000 div n_users"))
      .withColumn("lift_ppm", expr(
        """CASE WHEN conv_all > 0 THEN
          |CAST(CAST(n_converters AS DECIMAL(38,0)) * nu * 1000000
          |  div (CAST(n_users AS DECIMAL(38,0)) * conv_all) AS BIGINT) END"""
          .stripMargin))
    RelationalOps.globalRunningSum(dec, Seq(col("decile").asc),
        "n_converters", "cum_converters")
      .withColumn("capture_ppm",
        expr("CASE WHEN conv_all > 0 THEN cum_converters * 1000000 div conv_all END"))
      .select(col("decile"), col("n_users"), col("n_converters"),
        col("conv_ppm"), col("lift_ppm"), col("cum_converters"),
        col("capture_ppm"))
      .sortedOut("decile")
  }

  private val q253Sql =
    """WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted
      |  FROM events GROUP BY 1),
      |r AS (SELECT user_id, n_events, converted,
      |    CAST(row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rn
      |  FROM per),
      |t AS (SELECT CAST(max(rn) AS BIGINT) AS nu, CAST(sum(converted) AS BIGINT) AS conv_all FROM r),
      |d AS (SELECT CAST((rn - 1) * 10 // nu AS INTEGER) AS decile,
      |    CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(converted) AS BIGINT) AS n_converters,
      |    CAST(max(nu) AS BIGINT) AS nu, CAST(max(conv_all) AS BIGINT) AS conv_all
      |  FROM r CROSS JOIN t GROUP BY 1)
      |SELECT decile, n_users, n_converters,
      |  CAST(n_converters * 1000000 // n_users AS BIGINT) AS conv_ppm,
      |  CASE WHEN conv_all > 0 THEN
      |    CAST(CAST(n_converters AS HUGEINT) * nu * 1000000
      |      // (CAST(n_users AS HUGEINT) * conv_all) AS BIGINT) END AS lift_ppm,
      |  CAST(sum(n_converters) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_converters,
      |  CASE WHEN conv_all > 0 THEN
      |    CAST(CAST(sum(n_converters) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      * 1000000 // conv_all AS BIGINT) END AS capture_ppm
      |FROM d ORDER BY decile""".stripMargin

  // ------- Holt linear-trend smoothing, integer fixed point (q254)
  /** The FORECASTING primitive next to the descriptive time-series
    * family (CUSUM q218, autocorrelation q223, weekday profile q234):
    * double-exponential (Holt) smoothing of per-type daily volumes
    * with α = β = 1/4, run ENTIRELY in integer micro-units —
    *
    *   l_t = ⌊(c_t·1e6 + 3(l+b)) / 4⌋,  b_t = ⌊((l_t − l) + 3b) / 4⌋
    *
    * — so level, trend, one-step forecast, and the in-sample sum of
    * absolute one-step errors are EXACT BIGINTs, no fp drift across
    * engines or fold orders. Floor division is spelled explicitly
    * (x − posmod(x,4)) div 4 because Spark's `div` truncates toward
    * zero while DuckDB's `//` floors — they disagree precisely on the
    * negative numerators a downward trend produces.
    *
    * Scale shape: q244's calendar spine (|T|·n_days rows, tiny), one
    * (type, day) count aggregate over the fact table, then ONE
    * row-level `aggregate` fold per type over the calendar-bounded
    * day array — no windows, no iteration, no driver. The oracle
    * replays the identical recurrence as a recursive CTE. */
  private def q254(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type").as("et"),
      to_date(col("ts")).as("day"))
    val span = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("d0"),
        (datediff(col("d1"), col("d0")) + 1).cast(LongType).as("n_days"))
    val spine = e.select(col("et")).distinct()
      .crossJoin(broadcast(span))
      .select(col("et"), col("n_days"),
        explode(sequence(lit(0L), col("n_days") - 1)).as("i"))
    val daily = e.crossJoin(broadcast(span.select(col("d0"))))
      .groupBy(col("et"),
        datediff(col("day"), col("d0")).cast(LongType).as("i"))
      .agg(count(lit(1)).as("c"))
    val idx = spine.join(daily, Seq("et", "i"), "left_outer")
      .select(col("et"), col("n_days"), col("i"),
        coalesce(col("c"), lit(0L)).as("c"))
    val lNew = "(((x.c * 1000000 + 3 * (acc.l + acc.b)) - " +
      "(((x.c * 1000000 + 3 * (acc.l + acc.b)) % 4 + 4) % 4)) div 4)"
    val bNum = s"($lNew - acc.l + 3 * acc.b)"
    val bNew = s"(($bNum - ((($bNum) % 4 + 4) % 4)) div 4)"
    idx.groupBy(col("et").as("event_type"))
      .agg(max(col("n_days")).as("n_days"),
        array_sort(collect_list(struct(col("i"), col("c")))).as("xs"))
      .withColumn("st", expr(
        s"""aggregate(xs,
           |  named_struct('t', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT),
           |               'b', CAST(0 AS BIGINT), 'sae', CAST(0 AS BIGINT)),
           |  (acc, x) -> CASE WHEN acc.t = 0 THEN
           |      named_struct('t', CAST(1 AS BIGINT), 'l', x.c * 1000000,
           |                   'b', CAST(0 AS BIGINT), 'sae', CAST(0 AS BIGINT))
           |    ELSE named_struct('t', acc.t + 1, 'l', $lNew, 'b', $bNew,
           |      'sae', acc.sae + abs(x.c * 1000000 - (acc.l + acc.b))) END)"""
          .stripMargin))
      .select(col("event_type"), col("n_days"),
        col("st.l").as("level_micro"), col("st.b").as("trend_micro"),
        expr("st.l + st.b").as("forecast_micro"),
        col("st.sae").as("sae_micro"),
        expr("CASE WHEN st.t > 1 THEN st.sae div (st.t - 1) END").as("mae_micro"))
      .sortedOut("event_type")
  }

  private val q254Sql = {
    val lNew = "(((nxt.c * 1000000 + 3 * (st.l + st.b)) - " +
      "(((nxt.c * 1000000 + 3 * (st.l + st.b)) % 4 + 4) % 4)) // 4)"
    val bNum = s"($lNew - st.l + 3 * st.b)"
    val bNew = s"(($bNum - ((($bNum) % 4 + 4) % 4)) // 4)"
    s"""WITH RECURSIVE e AS (SELECT event_type AS et, CAST(ts AS DATE) AS day FROM events),
       |sp AS (SELECT min(day) AS d0,
       |    CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS n_days FROM e),
       |cal AS (SELECT et, CAST(x.i AS BIGINT) AS i FROM (SELECT DISTINCT et FROM e), sp,
       |        (SELECT unnest(range(0, (SELECT n_days FROM sp))) AS i) x),
       |dc AS (SELECT et, CAST(date_diff('day', (SELECT d0 FROM sp), day) AS BIGINT) AS i,
       |    CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
       |idx AS MATERIALIZED (SELECT cal.et, cal.i, coalesce(dc.c, 0) AS c
       |  FROM cal LEFT JOIN dc USING (et, i)),
       |st AS (
       |  SELECT et, CAST(0 AS BIGINT) AS i, CAST(c * 1000000 AS BIGINT) AS l,
       |      CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS sae
       |  FROM idx WHERE i = 0
       |  UNION ALL
       |  SELECT st.et, st.i + 1, $lNew, $bNew,
       |    st.sae + abs(nxt.c * 1000000 - (st.l + st.b))
       |  FROM st JOIN idx nxt ON nxt.et = st.et AND nxt.i = st.i + 1)
       |SELECT st.et AS event_type, (SELECT n_days FROM sp) AS n_days,
       |  l AS level_micro, b AS trend_micro, l + b AS forecast_micro,
       |  sae AS sae_micro, CASE WHEN i > 0 THEN CAST(sae // i AS BIGINT) END AS mae_micro
       |FROM st WHERE i = (SELECT n_days FROM sp) - 1 ORDER BY event_type""".stripMargin
  }

  // ------- l-diversity + t-closeness privacy audit (q255)
  /** The two release-gate measures BEYOND q194's k-anonymity bands:
    * for each quasi-identifier class (nation × market segment), the
    * DIVERSITY of the sensitive attribute (distinct balance
    * kilobuckets, l) and its t-CLOSENESS — the ordered-attribute EMD
    * between the class's sensitive distribution and the global one,
    *
    *   t = Σ_j |F_class(j)·N − F_glob(j)·m| / (m·N·(B−1))
    *
    * cleared to a common denominator so the numerator is an exact
    * DECIMAL(38,0) (no per-class rational rounding), reported in ppm.
    * A class can be k-anonymous and l-diverse yet still leak through
    * skew — t-closeness is the measure that catches it.
    *
    * Scale shape: one (class, bucket) aggregate off the table, then
    * everything lives on the class×bucket spine (both axes
    * domain-bounded — the bucket axis through the q248 bounded
    * registry); cumulatives ride a window PARTITIONED by class whose
    * partitions are bucket-domain-bounded. One final ppm division. */
  private def q255(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = t(s, d, "customer")
      .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_kb"))
      .groupBy(col("nat"), col("seg"), col("bal_kb"))
      .agg(count(lit(1)).as("cnt")).persistT
    val classes = cells.groupBy(col("nat"), col("seg"))
      .agg(sum(col("cnt")).as("m"), count(lit(1)).as("l_diversity"))
    // NOT cached: caching would wrap the registry in an InMemoryRelation
    // that hides boundedRegistry's static limit(4096) from planLint's
    // maxRows-keyed waivers — and recomputing it is one cheap agg over
    // the already-cached `cells`.
    val buckets = RelationalOps.boundedRegistry(
      cells.groupBy(col("bal_kb")).agg(sum(col("cnt")).as("g")),
      4096, "q255 sensitive-bucket axis")
    val nb = buckets.agg(sum(col("g")).as("n_total"),
      count(lit(1)).as("n_buckets"))
    val spine = classes.crossJoin(broadcast(buckets.select(col("bal_kb"))))
      .join(cells, Seq("nat", "seg", "bal_kb"), "left_outer")
      .select(col("nat"), col("seg"), col("m"), col("l_diversity"),
        col("bal_kb"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val wc = Window.partitionBy(col("nat"), col("seg"))
      .orderBy(col("bal_kb")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.orderBy(col("bal_kb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gcum = buckets.select(col("bal_kb"),
      sum(col("g")).over(wg).as("cum_g"))
    spine.withColumn("cum_c", sum(col("cnt")).over(wc))
      .join(broadcast(gcum), Seq("bal_kb"))
      .crossJoin(broadcast(nb))
      .groupBy(col("nat"), col("seg"))
      .agg(max(col("m")).as("m"), max(col("l_diversity")).as("l_diversity"),
        sum(expr("abs(CAST(cum_c AS DECIMAL(38,0)) * n_total - CAST(cum_g AS DECIMAL(38,0)) * m)"))
          .as("t_num"),
        max(col("n_total")).as("n_total"), max(col("n_buckets")).as("n_buckets"))
      .withColumn("t_closeness_ppm", expr(
        """CAST(CAST(t_num AS DECIMAL(38,0)) * 1000000
          |  div (CAST(m AS DECIMAL(38,0)) * n_total * (n_buckets - 1)) AS BIGINT)"""
          .stripMargin))
      .select(col("nat"), col("seg"), col("m"), col("l_diversity"),
        col("t_closeness_ppm"))
      .sortedOut("nat", "seg")
  }

  private val q255Sql =
    """WITH cells AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM customer GROUP BY 1, 2, 3),
      |cls AS (SELECT nat, seg, CAST(sum(cnt) AS BIGINT) AS m,
      |    CAST(count(*) AS BIGINT) AS l_diversity FROM cells GROUP BY 1, 2),
      |bk AS (SELECT bal_kb, CAST(sum(cnt) AS BIGINT) AS g FROM cells GROUP BY 1),
      |nb AS (SELECT CAST(sum(g) AS BIGINT) AS n_total,
      |    CAST(count(*) AS BIGINT) AS n_buckets FROM bk),
      |gcum AS (SELECT bal_kb, CAST(sum(g) OVER (ORDER BY bal_kb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g FROM bk),
      |sp AS (SELECT cls.nat, cls.seg, cls.m, cls.l_diversity, bk.bal_kb,
      |    coalesce(cells.cnt, 0) AS cnt
      |  FROM cls CROSS JOIN bk LEFT JOIN cells
      |    ON cells.nat = cls.nat AND cells.seg = cls.seg AND cells.bal_kb = bk.bal_kb),
      |cum AS (SELECT nat, seg, m, l_diversity, bal_kb, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY nat, seg ORDER BY bal_kb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
      |  FROM sp)
      |SELECT cum.nat, cum.seg, CAST(max(m) AS BIGINT) AS m,
      |  CAST(max(l_diversity) AS BIGINT) AS l_diversity,
      |  CAST(sum(abs(CAST(cum_c AS HUGEINT) * nb.n_total
      |        - CAST(gcum.cum_g AS HUGEINT) * m)) * 1000000
      |    // (CAST(max(m) AS HUGEINT) * max(nb.n_total) * (max(nb.n_buckets) - 1))
      |    AS BIGINT) AS t_closeness_ppm
      |FROM cum JOIN gcum USING (bal_kb) CROSS JOIN nb
      |GROUP BY 1, 2 ORDER BY nat, seg""".stripMargin

  // ------- join-skew advisor (q256)
  /** The pre-flight SKEW census a 100 TB join plan runs before picking
    * a strategy: for each candidate shuffle key, the key-cardinality /
    * heaviest-key profile and the concrete mitigation number — the
    * SALT FACTOR that would cap the heaviest key's share of a 32-way
    * shuffle at the uniform-partition budget, ceil(max_mass·P/total).
    * skew_x_ppm is max-over-mean key mass (1e6 = perfectly uniform);
    * AQE's runtime skew split handles the moderate cases, the advisor
    * exists for the keys where the BUILD of one reducer would OOM
    * before AQE can split it.
    *
    * Scale shape: per key ONE map-side-combinable count aggregate
    * followed by a key-bounded rollup — the fact table is read once
    * per audited key with only (key, count) ever shuffled. */
  private def q256(s: SparkSession, d: String): DataFrame = {
    val targetP = 32L
    def audit(df: DataFrame, table: String, key: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("m"))
        .agg(sum(col("m")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("m")).as("max_mass"))
        .select(lit(s"$table.$key").as("join_key"),
          col("n_rows"), col("n_keys"), col("max_mass"),
          expr("max_mass * 1000000 div n_rows").as("max_mass_ppm"),
          expr("""CAST(CAST(max_mass AS DECIMAL(38,0)) * n_keys * 1000000
                 |  div CAST(n_rows AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)
            .as("skew_x_ppm"),
          expr(s"(max_mass * $targetP + n_rows - 1) div n_rows").as("salt_factor"))
    val li = t(s, d, "lineitem")
    Seq(
      audit(li, "lineitem", "l_orderkey"),
      audit(li, "lineitem", "l_partkey"),
      audit(li, "lineitem", "l_suppkey"),
      audit(Tables.events(s, d), "events", "user_id"))
      .reduce(_ unionByName _)
      .sortedOut("join_key")
  }

  private val q256Sql = {
    def audit(table: String, key: String): String =
      s"""SELECT '$table.$key' AS join_key,
         |  CAST(sum(m) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(max(m) AS BIGINT) AS max_mass,
         |  CAST(max(m) * 1000000 // sum(m) AS BIGINT) AS max_mass_ppm,
         |  CAST(CAST(max(m) AS HUGEINT) * count(*) * 1000000
         |    // CAST(sum(m) AS HUGEINT) AS BIGINT) AS skew_x_ppm,
         |  CAST((max(m) * 32 + sum(m) - 1) // sum(m) AS BIGINT) AS salt_factor
         |FROM (SELECT $key, CAST(count(*) AS BIGINT) AS m FROM $table GROUP BY 1) g""".stripMargin
    s"""${audit("lineitem", "l_orderkey")}
       |UNION ALL
       |${audit("lineitem", "l_partkey")}
       |UNION ALL
       |${audit("lineitem", "l_suppkey")}
       |UNION ALL
       |${audit("events", "user_id")}
       |ORDER BY join_key""".stripMargin
  }

  // ------- multi-source BFS reach census (q257)
  /** [[graft.ops.Graph.bfs]] from the three lowest-id customers of the
    * repeat-trade graph (q250's edge definition): exact minimum hop
    * distance to every node within 3 hops, plus the unreached
    * remainder (dist = -1). REACH is the graph primitive the family
    * still lacked — pageRank/hits say "important", LPA says
    * "same neighborhood", kCore says "dense"; BFS says "how far",
    * the kernel of crawl-frontier planning and
    * contamination-spread audits.
    *
    * Scale shape: hop-synchronous frontier expansion — each round is
    * one hash join of the (persisted) adjacency against the frontier
    * plus one anti-join against the visited set, both bounded by |E|,
    * behind a lineage cut; exactly 3 rounds, early-exit on an
    * exhausted frontier. The oracle unrolls the same 3 rounds as
    * MATERIALIZED CTEs. */
  private def q257(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("a"),
        (col("l_suppkey") + lit(10000000L)).as("b"))
      .agg(count(lit(1)).as("m"))
      .where(col("m") >= 2)
      .select(col("a"), col("b"))
      .persistT
    val seeds = edges.select(col("a").as("node")).distinct()
      .orderBy(col("node")).limit(3)
    val visited = graft.ops.Graph.bfs(edges, seeds, maxHops = 3).persistT
    val allNodes = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node"))).distinct()
    val unreached = allNodes.join(visited.select("node"), Seq("node"), "left_anti")
      .select(col("node"), lit(-1).as("dist"))
    visited.unionByName(unreached)
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node") < 10000000L, 1L).otherwise(0L)).as("n_custs"),
        sum(when(col("node") >= 10000000L, 1L).otherwise(0L)).as("n_supps"))
      .sortedOut("dist")
  }

  private val q257Sql = {
    // round r: the sym-adjacency image of frontier r-1, minus everything
    // already visited — each CTE referenced multiple times, so MATERIALIZED
    def round(r: Int): String =
      s"""f$r AS MATERIALIZED (SELECT DISTINCT s.b AS node FROM sym s
         |  JOIN f${r - 1} f ON s.a = f.node
         |  WHERE s.b NOT IN (SELECT node FROM v${r - 1})),
         |v$r AS MATERIALIZED (SELECT node FROM v${r - 1} UNION SELECT node FROM f$r)""".stripMargin
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT a, b FROM (
       |    SELECT o.o_custkey AS a, l.l_suppkey + 10000000 AS b, count(*) AS m
       |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |    GROUP BY 1, 2) g WHERE m >= 2),
       |sym AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |f0 AS MATERIALIZED (SELECT node FROM (
       |  SELECT DISTINCT a AS node FROM e0 ORDER BY node LIMIT 3) s),
       |v0 AS (SELECT node FROM f0),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |dist AS (SELECT node, 0 AS dist FROM f0
       |  UNION ALL SELECT node, 1 FROM f1
       |  UNION ALL SELECT node, 2 FROM f2
       |  UNION ALL SELECT node, 3 FROM f3),
       |alln AS (SELECT a AS node FROM e0 UNION SELECT b FROM e0),
       |full_d AS (SELECT node, dist FROM dist
       |  UNION ALL SELECT node, -1 FROM alln
       |    WHERE node NOT IN (SELECT node FROM v3))
       |SELECT CAST(dist AS INTEGER) AS dist,
       |  CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(CASE WHEN node < 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_custs,
       |  CAST(sum(CASE WHEN node >= 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_supps
       |FROM full_d GROUP BY 1 ORDER BY dist""".stripMargin
  }

  // ------- exact pairwise r-squared matrix (q258)
  /** The correlation-structure census of the fact table's measures —
    * Pearson r² for every pair of {quantity, price (whole dollars),
    * discount (cents), tax (cents)} per (returnflag, linestatus)
    * group, EXACTLY: cov = n·Σxy − Σx·Σy and the two variance
    * numerators stay DECIMAL(38,0) integers, r² lands in ppm through
    * a TWO-STAGE floor division `(cov² div vx)·10⁶ div vy` — spelled
    * identically in the oracle, so the (sub-ppm, deterministic)
    * staging bias cancels bit-for-bit. Sign travels separately
    * (sign(cov)): r² loses it, analysts need it. Spearman (q174) and
    * Kendall (q215) rank-correlate SAMPLED signals; this is the exact
    * moment-based matrix over the full table.
    *
    * Scale shape: ONE map-side-combinable aggregate over the fact
    * table computes all 14 moment sums per group; the 6 pair rows are
    * projections of that 6-row frame. Magnitude precondition
    * (documented, enforced by the dollars/cents unit choice):
    * cov² < 10³⁸ holds through n ≈ 10⁶ rows per group at these value
    * ranges — beyond that, center on a first-pass global mean or drop
    * to per-partition Welford merges before clearing to integers. */
  private def q258(s: SparkSession, d: String): DataFrame = {
    val dec = "DECIMAL(38,0)"
    val base = t(s, d, "lineitem").select(
      col("l_returnflag").as("rflag"), col("l_linestatus").as("lstat"),
      round(col("l_quantity")).cast(LongType).as("q"),
      floor(col("l_extendedprice")).cast(LongType).as("p"),
      round(col("l_discount") * 100).cast(LongType).as("dc"),
      round(col("l_tax") * 100).cast(LongType).as("tc"))
    val vars = Seq("q", "p", "dc", "tc")
    val moments = base.groupBy(col("rflag"), col("lstat")).agg(
      count(lit(1)).as("n"),
      vars.map(v => sum(expr(s"CAST($v AS $dec)")).as(s"s_$v")) ++
        (for (i <- vars.indices; j <- i until vars.length)
          yield sum(expr(s"CAST(${vars(i)} AS $dec) * ${vars(j)}"))
            .as(s"s_${vars(i)}_${vars(j)}")): _*)
      .persistT
    val pairs = for (i <- vars.indices; j <- (i + 1) until vars.length) yield {
      val (x, y) = (vars(i), vars(j))
      moments.select(col("rflag"), col("lstat"),
        lit(s"${x}_$y").as("pair"), col("n"),
        expr(s"CAST(sign(n * s_${x}_$y - s_$x * s_$y) AS BIGINT)").as("r_sign"),
        // staged floor: a = |cov|·10⁶ div vx (≤ 10⁶·√(vy/vx) by
        // Cauchy-Schwarz — fits LONG), then (a·|cov|) div vy ≤ 10⁶.
        // abs() keeps every operand non-negative, where Spark's
        // truncating div and DuckDB's flooring // agree (q254 lesson).
        expr(
          s"""CASE WHEN (n * s_${x}_$x - s_$x * s_$x) = 0
             |       OR (n * s_${y}_$y - s_$y * s_$y) = 0 THEN NULL
             |  ELSE CAST(
             |    ((abs(n * s_${x}_$y - s_$x * s_$y) * 1000000
             |        div (n * s_${x}_$x - s_$x * s_$x))
             |      * abs(n * s_${x}_$y - s_$x * s_$y))
             |      div (n * s_${y}_$y - s_$y * s_$y) AS BIGINT) END"""
            .stripMargin).as("r2_ppm"))
    }
    pairs.reduce(_ unionByName _).sortedOut("rflag", "lstat", "pair")
  }

  private val q258Sql = {
    val vars = Seq("q", "p", "dc", "tc")
    val sums = (vars.map(v => s"sum(CAST($v AS HUGEINT)) AS s_$v") ++
      (for (i <- vars.indices; j <- i until vars.length)
        yield s"sum(CAST(${vars(i)} AS HUGEINT) * ${vars(j)}) AS s_${vars(i)}_${vars(j)}"))
      .mkString(",\n|    ")
    val pairSel = (for (i <- vars.indices; j <- (i + 1) until vars.length) yield {
      val (x, y) = (vars(i), vars(j))
      s"""SELECT rflag, lstat, '${x}_$y' AS pair, n,
         |  CAST(sign(n * s_${x}_$y - s_$x * s_$y) AS BIGINT) AS r_sign,
         |  CASE WHEN (n * s_${x}_$x - s_$x * s_$x) = 0
         |         OR (n * s_${y}_$y - s_$y * s_$y) = 0 THEN NULL
         |    ELSE CAST(
         |      ((abs(n * s_${x}_$y - s_$x * s_$y) * 1000000
         |          // (n * s_${x}_$x - s_$x * s_$x))
         |        * abs(n * s_${x}_$y - s_$x * s_$y))
         |        // (n * s_${y}_$y - s_$y * s_$y) AS BIGINT) END AS r2_ppm
         |FROM m""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"""WITH b AS (SELECT l_returnflag AS rflag, l_linestatus AS lstat,
       |    CAST(round(l_quantity) AS BIGINT) AS q,
       |    CAST(floor(l_extendedprice) AS BIGINT) AS p,
       |    CAST(round(l_discount * 100) AS BIGINT) AS dc,
       |    CAST(round(l_tax * 100) AS BIGINT) AS tc
       |  FROM lineitem),
       |m AS MATERIALIZED (SELECT rflag, lstat, CAST(count(*) AS BIGINT) AS n,
       |    $sums
       |  FROM b GROUP BY 1, 2)
       |$pairSel
       |ORDER BY rflag, lstat, pair""".stripMargin
  }

  // ------- watermark-lateness advisor (q259)
  /** The empirical input to choosing `withWatermark`'s delay: treating
    * event_id as the ARRIVAL order (the fixture's ingest sequence) and
    * ts as event time, the high-water mark at each arrival is the
    * running max of event time — a record arriving with ts below it is
    * LATE by the difference. Reports, per event type and lateness band
    * (on-time / ≤1 min / ≤5 min / ≤1 h / >1 h), the record count,
    * its ppm share of the type, and the band's worst lateness — read
    * directly: "a 5-minute watermark loses X ppm of purchases".
    *
    * Scale shape: the high-water mark rides
    * [[RelationalOps.globalRunningMax]] (range-partition + P-long
    * offset round — never an unpartitioned window); everything after
    * is one (type, band)-grain aggregate and a broadcast totals join.
    * The oracle spells the same running max as a window (single
    * partition is fine at oracle scale). */
  private def q259(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"),
      col("event_type"), unix_millis(col("ts")).as("ms"))
    val wm = RelationalOps.globalRunningMax(ev,
      Seq(col("event_id").asc), "ms", "hwm")
    val banded = wm.withColumn("late_ms", col("hwm") - col("ms"))
      .withColumn("band", expr(
        """CASE WHEN late_ms = 0 THEN 'a_ontime'
          |  WHEN late_ms <= 60000 THEN 'b_1min'
          |  WHEN late_ms <= 300000 THEN 'c_5min'
          |  WHEN late_ms <= 3600000 THEN 'd_1hour'
          |  ELSE 'e_beyond' END""".stripMargin))
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("n"), max(col("late_ms")).as("max_late_ms"))
      .persistT
    val tot = banded.groupBy(col("event_type")).agg(sum(col("n")).as("tn"))
    banded.join(tot, Seq("event_type"))
      .select(col("event_type"), col("band"), col("n"),
        expr("n * 1000000 div tn").as("share_ppm"), col("max_late_ms"))
      .sortedOut("event_type", "band")
  }

  private val q259Sql =
    """WITH w AS (SELECT event_type,
      |    CAST(max(CAST(epoch_ms(ts) AS BIGINT)) OVER (ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      - CAST(epoch_ms(ts) AS BIGINT) AS BIGINT) AS late_ms
      |  FROM events),
      |b AS (SELECT event_type,
      |    CASE WHEN late_ms = 0 THEN 'a_ontime'
      |      WHEN late_ms <= 60000 THEN 'b_1min'
      |      WHEN late_ms <= 300000 THEN 'c_5min'
      |      WHEN late_ms <= 3600000 THEN 'd_1hour'
      |      ELSE 'e_beyond' END AS band, late_ms
      |  FROM w),
      |g AS (SELECT event_type, band, CAST(count(*) AS BIGINT) AS n,
      |    CAST(max(late_ms) AS BIGINT) AS max_late_ms
      |  FROM b GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tn FROM g GROUP BY 1)
      |SELECT g.event_type, g.band, g.n,
      |  CAST(g.n * 1000000 // t.tn AS BIGINT) AS share_ppm, g.max_late_ms
      |FROM g JOIN t USING (event_type) ORDER BY event_type, band""".stripMargin

  // ------- RFM segmentation census (q260)
  /** Classic Recency/Frequency/Monetary segmentation, exact: per
    * customer-with-orders, last order date, order count, and lifetime
    * cents; each dimension quintiled by the EXPLICIT equi-depth
    * formula `(rn−1)·5 div n + 1` over a total order (metric,
    * custkey) — never `ntile`, whose bucket-remainder placement
    * differs between engines, and never an unpartitioned ranking
    * window (all three rankings ride
    * [[RelationalOps.globalRowNumber]], the q198 lesson). Quintile 1
    * is best (most recent / most orders / highest spend). Output: the
    * populated (r,f,m) cell census with customer count and cents
    * mass — the targeting mix a CRM team actually pulls.
    *
    * Scale shape: one orders-grain aggregate, three range-partitioned
    * prefix scans, one broadcast of the 1-row total, one final
    * ≤125-row census aggregate. */
  private def q260(s: SparkSession, d: String): DataFrame = {
    val per = t(s, d, "orders").groupBy(col("o_custkey").as("c"))
      .agg(max(unix_millis(col("o_orderdate"))).as("last_ms"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast(LongType)).as("cents"))
      .persistT
    def quintile(order: Seq[org.apache.spark.sql.Column], out: String)(df: DataFrame): DataFrame =
      RelationalOps.globalRowNumber(df, order, "rn")
        .withColumn(out, expr("CAST((rn - 1) * 5 div nc + 1 AS INT)"))
        .drop("rn")
    val tot = per.agg(count(lit(1)).as("nc"))
    val scored = Function.chain(Seq(
      quintile(Seq(col("last_ms").desc, col("c").asc), "r_q") _,
      quintile(Seq(col("freq").desc, col("c").asc), "f_q") _,
      quintile(Seq(col("cents").desc, col("c").asc), "m_q") _))(
      per.crossJoin(broadcast(tot)))
    scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cents"))
      .sortedOut("r_q", "f_q", "m_q")
  }

  private val q260Sql =
    """WITH per AS (SELECT o_custkey AS c,
      |    CAST(max(epoch_ms(o_orderdate)) AS BIGINT) AS last_ms,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM per),
      |r AS (SELECT c, cents,
      |    CAST((row_number() OVER (ORDER BY last_ms DESC, c ASC) - 1) * 5 // nc + 1 AS INTEGER) AS r_q,
      |    CAST((row_number() OVER (ORDER BY freq DESC, c ASC) - 1) * 5 // nc + 1 AS INTEGER) AS f_q,
      |    CAST((row_number() OVER (ORDER BY cents DESC, c ASC) - 1) * 5 // nc + 1 AS INTEGER) AS m_q
      |  FROM per CROSS JOIN t)
      |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM r GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin

  // ------- behavioral trigram census (q261)
  /** Third-order sequential patterns: every consecutive
    * (event, next, next-next) triple per user under the total order
    * (ts, event_id), counted globally with ppm share — the
    * order-3 extension of q148's transition matrix (order 2), where
    * funnel-shaped regularities (view→click→purchase vs
    * view→view→view) become directly readable. Bounded output: with
    * E event types, at most E³ rows.
    *
    * Scale shape: one window partitioned BY USER (per-partition size
    * = per-user activity, never corpus-sized) produces both leads in
    * a single sort; the census is map-side-combinable; the total is a
    * 1-row broadcast. */
  private def q261(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tri = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .where(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .persistT
    val tot = tri.agg(sum(col("n")).as("tn"))
    tri.crossJoin(broadcast(tot))
      .select(col("e1"), col("e2"), col("e3"), col("n"),
        expr("n * 1000000 div tn").as("share_ppm"))
      .sortedOut("e1", "e2", "e3")
  }

  private val q261Sql =
    """WITH s AS (SELECT event_type AS e1,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events),
      |g AS (SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n FROM s
      |  WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM g)
      |SELECT e1, e2, e3, n, CAST(n * 1000000 // tn AS BIGINT) AS share_ppm
      |FROM g CROSS JOIN t ORDER BY e1, e2, e3""".stripMargin

  // ------- deterministic-sample representativeness audit (q262)
  /** The "can I trust my 1-in-16 dev sample" gate: a deterministic
    * md5-keyed 1/16 sample of orders (first hex nibble = '0' — the
    * same hash-bucket discipline as q252's stratum cap, so the sample
    * is stable across runs and machines), compared against the full
    * table per order priority: full vs in-sample composition ppm and
    * the signed bias. A hash sample is unbiased in expectation; this
    * measures the REALIZED bias on this corpus before the sample
    * calibrates anything downstream (the cheap companion to q173's
    * distribution-matched resampler).
    *
    * Scale shape: ONE pass over orders computes both censuses (the
    * sample flag is a projected column, not a second scan); totals
    * are a 1-row broadcast. */
  private def q262(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "orders")
      .select(col("o_orderpriority").as("priority"),
        (substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
          .cast(LongType).as("ins"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_full"), sum(col("ins")).as("n_sample"))
      .persistT
    val tot = g.agg(sum(col("n_full")).as("tf"), sum(col("n_sample")).as("ts"))
    g.crossJoin(broadcast(tot))
      .select(col("priority"), col("n_full"), col("n_sample"),
        expr("n_full * 1000000 div tf").as("full_share_ppm"),
        expr("CASE WHEN ts = 0 THEN NULL ELSE n_sample * 1000000 div ts END")
          .as("sample_share_ppm"),
        expr("""CASE WHEN ts = 0 THEN NULL ELSE
                |  n_sample * 1000000 div ts - n_full * 1000000 div tf END"""
          .stripMargin).as("bias_ppm"))
      .sortedOut("priority")
  }

  private val q262Sql =
    """WITH g AS (SELECT o_orderpriority AS priority,
      |    CAST(count(*) AS BIGINT) AS n_full,
      |    CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_sample
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n_full) AS BIGINT) AS tf,
      |    CAST(sum(n_sample) AS BIGINT) AS ts FROM g)
      |SELECT priority, n_full, n_sample,
      |  CAST(n_full * 1000000 // tf AS BIGINT) AS full_share_ppm,
      |  CAST(CASE WHEN ts = 0 THEN NULL ELSE n_sample * 1000000 // ts END AS BIGINT) AS sample_share_ppm,
      |  CAST(CASE WHEN ts = 0 THEN NULL ELSE
      |    n_sample * 1000000 // ts - n_full * 1000000 // tf END AS BIGINT) AS bias_ppm
      |FROM g CROSS JOIN t ORDER BY priority""".stripMargin

  // ------- peak session concurrency (q263)
  /** The interval-overlap sweep — "how many sessions were open at
    * once, per day": q43's 30-minute-gap sessions become ±1 deltas at
    * [start, end+1), deltas are NETTED PER TIMESTAMP (so the running
    * sum is tie-order-independent by construction), and the
    * concurrency curve is one [[RelationalOps.globalRunningSum]] over
    * the unique-timestamp spine. The capacity-planning primitive
    * (peak concurrent users/connections/rooms) that pure groupBys
    * can't express and per-key windows don't cover — this is a
    * GLOBAL total order, which is exactly what the distributed prefix
    * scan exists for.
    *
    * Scale shape: sessionization is a user-partitioned window; the
    * sweep spine is ≤ 2 timestamps per session, netted map-side; the
    * prefix scan is range-partition + a P-long offset round; the
    * per-day max is map-side-combinable. */
  private def q263(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMs = 30 * 60000L
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > gapMs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"))
    val deltas = sess.select(col("start_ms").as("ms"), lit(1L).as("dl"))
      .unionAll(sess.select((col("end_ms") + 1).as("ms"), lit(-1L).as("dl")))
      .groupBy(col("ms")).agg(sum(col("dl")).as("net"))
    RelationalOps.globalRunningSum(deltas, Seq(col("ms").asc), "net", "conc")
      .withColumn("day", expr("ms div 86400000"))
      .groupBy(col("day"))
      .agg(max(col("conc")).as("peak_concurrency"),
        sum(when(col("net") > 0, col("net")).otherwise(0L)).as("net_opens"))
      .sortedOut("day")
  }

  private val q263Sql =
    """WITH e AS (SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ms, event_id FROM events),
      |m AS (SELECT user_id, ms, CASE WHEN lag(ms) OVER
      |      (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
      |      OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |x AS (SELECT user_id, ms, sum(is_new) OVER (PARTITION BY user_id
      |    ORDER BY ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m),
      |sess AS (SELECT user_id, sid, min(ms) AS start_ms, max(ms) AS end_ms
      |  FROM x GROUP BY 1, 2),
      |pts AS (SELECT ms, CAST(sum(dl) AS BIGINT) AS net FROM (
      |    SELECT start_ms AS ms, 1 AS dl FROM sess
      |    UNION ALL SELECT end_ms + 1, -1 FROM sess) u GROUP BY ms),
      |rs AS (SELECT ms, net, CAST(sum(net) OVER (ORDER BY ms
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
      |  FROM pts)
      |SELECT ms // 86400000 AS day,
      |  CAST(max(conc) AS BIGINT) AS peak_concurrency,
      |  CAST(sum(CASE WHEN net > 0 THEN net ELSE 0 END) AS BIGINT) AS net_opens
      |FROM rs GROUP BY 1 ORDER BY day""".stripMargin

  // ------- broadcast-threshold advisor (q264)
  /** The join-strategy pre-flight for every dimension table: exact row
    * count and a serialized-size proxy (fixed numeric widths + actual
    * string lengths) against the classic 10 MiB
    * autoBroadcastJoinThreshold — "which sides of my star joins are
    * safely broadcastable, and how much headroom do they have".
    * Reported in exact bytes and broadcast-budget ppm; the companion
    * to q256's shuffle-side skew advisor (the OTHER reason a join
    * strategy flips at scale).
    *
    * Scale shape: one map-side-combinable aggregate per audited
    * table; nothing shuffles but five 1-row partials. */
  private def q264(s: SparkSession, d: String): DataFrame = {
    val thr = 10485760L // 10 MiB
    def audit(table: String, widths: org.apache.spark.sql.Column): DataFrame =
      t(s, d, table).agg(count(lit(1)).as("n_rows"),
          sum(widths.cast(LongType)).as("bytes"))
        .select(lit(table).as("tbl"), col("n_rows"), col("bytes"),
          expr(s"bytes * 1000000 div $thr").as("budget_ppm"),
          (col("bytes") <= thr).as("broadcastable"))
    Seq(
      audit("nation", lit(4 + 4) + length(col("n_name"))),
      audit("region", lit(4) + length(col("r_name"))),
      audit("customer", lit(8 + 4 + 8) + length(col("c_name")) + length(col("c_mktsegment"))),
      audit("supplier", lit(8 + 4 + 8) + length(col("s_name"))),
      audit("part", lit(8 + 4 + 8) + length(col("p_name")) + length(col("p_brand")) + length(col("p_type"))))
      .reduce(_ unionByName _)
      .sortedOut("tbl")
  }

  private val q264Sql = {
    def audit(table: String, widths: String): String =
      s"""SELECT '$table' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum($widths) AS BIGINT) AS bytes,
         |  CAST(sum($widths) * 1000000 // 10485760 AS BIGINT) AS budget_ppm,
         |  sum($widths) <= 10485760 AS broadcastable
         |FROM $table""".stripMargin
    Seq(
      audit("nation", "8 + length(n_name)"),
      audit("region", "4 + length(r_name)"),
      audit("customer", "20 + length(c_name) + length(c_mktsegment)"),
      audit("supplier", "20 + length(s_name)"),
      audit("part", "20 + length(p_name) + length(p_brand) + length(p_type)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl")
  }

  // ------- near-zero-variance feature screen (q265)
  /** The feature-prep gate (caret's nearZeroVar, exact): for each
    * audited categorical column, the distinct count, the top-two value
    * frequencies, their ratio in ppm, the unique-share in ppm, and the
    * flag `freq_ratio > 19 AND unique share < 10%` (single-valued
    * columns flag unconditionally, ratio NULL) — columns that will
    * contribute nothing but one-hot width to a downstream model.
    *
    * Scale shape: per feature, one map-side-combinable value census;
    * the top-2 read is `orderBy(cnt).limit(2)` — TakeOrderedAndProject
    * over the (domain-bounded) census, never a ranking window. */
  private def q265(s: SparkSession, d: String): DataFrame = {
    def screen(df: DataFrame, table: String, c: String): DataFrame = {
      val vc = df.select(col(c).cast("string").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("cnt")).persistT
      val top2 = vc.orderBy(col("cnt").desc, col("v").asc).limit(2)
        .agg(max(col("cnt")).as("m1"), min(col("cnt")).as("m2"),
          count(lit(1)).as("ntop"))
      val base = vc.agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("n_distinct"))
      base.crossJoin(broadcast(top2))
        .select(lit(s"$table.$c").as("feature"), col("n"), col("n_distinct"),
          col("m1").as("top1_n"),
          when(col("ntop") < 2, lit(null)).otherwise(col("m2")).as("top2_n"),
          when(col("ntop") < 2, lit(null))
            .otherwise(expr("m1 * 1000000 div m2")).as("freq_ratio_ppm"),
          expr("n_distinct * 1000000 div n").as("unique_ppm"),
          (col("ntop") < 2 ||
            (expr("m1 * 1000000 div m2") > 19000000L &&
              expr("n_distinct * 1000000 div n") < 100000L)).as("nzv"))
    }
    Seq(
      screen(t(s, d, "orders"), "orders", "o_orderstatus"),
      screen(t(s, d, "orders"), "orders", "o_orderpriority"),
      screen(t(s, d, "lineitem"), "lineitem", "l_returnflag"),
      screen(t(s, d, "lineitem"), "lineitem", "l_linestatus"),
      screen(t(s, d, "customer"), "customer", "c_mktsegment"),
      screen(Tables.events(s, d), "events", "event_type"))
      .reduce(_ unionByName _)
      .sortedOut("feature")
  }

  private val q265Sql = {
    def screen(table: String, c: String): String =
      s"""SELECT '$table.$c' AS feature, b.n, b.n_distinct,
         |  t2.m1 AS top1_n,
         |  CASE WHEN t2.ntop < 2 THEN NULL ELSE t2.m2 END AS top2_n,
         |  CASE WHEN t2.ntop < 2 THEN NULL
         |    ELSE CAST(t2.m1 * 1000000 // t2.m2 AS BIGINT) END AS freq_ratio_ppm,
         |  CAST(b.n_distinct * 1000000 // b.n AS BIGINT) AS unique_ppm,
         |  (t2.ntop < 2 OR (t2.m1 * 1000000 // t2.m2 > 19000000
         |    AND b.n_distinct * 1000000 // b.n < 100000)) AS nzv
         |FROM
         |  (SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |     CAST(count(*) AS BIGINT) AS n_distinct
         |   FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt FROM $table GROUP BY 1) vc) b
         |CROSS JOIN
         |  (SELECT CAST(max(cnt) AS BIGINT) AS m1, CAST(min(cnt) AS BIGINT) AS m2,
         |     CAST(count(*) AS BIGINT) AS ntop
         |   FROM (SELECT count(*) AS cnt FROM
         |     (SELECT CAST($c AS VARCHAR) AS v FROM $table) s GROUP BY v
         |     ORDER BY cnt DESC, min(v) ASC LIMIT 2) tt) t2""".stripMargin
    Seq(screen("orders", "o_orderstatus"), screen("orders", "o_orderpriority"),
      screen("lineitem", "l_returnflag"), screen("lineitem", "l_linestatus"),
      screen("customer", "c_mktsegment"), screen("events", "event_type"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY feature")
  }

  // ------- smoothed target encoding (q266)
  /** Mean-target encoding with additive (m-estimate) smoothing, the
    * category-to-number bridge of tabular ML prep: per customer
    * nation, the urgent-order rate shrunk toward the global rate by
    * m = 100 pseudo-observations — `enc = (conv·10⁶ + m·glob_ppm)
    * div (n + m)` — computed entirely in integer ppm so sparse
    * categories (where naive rates overfit) demonstrably pull toward
    * the prior. Raw rate ships alongside for the shrinkage delta.
    *
    * Scale shape: one broadcast dim join + one category-grain
    * aggregate + a 1-row global broadcast. */
  private def q266(s: SparkSession, d: String): DataFrame = {
    val m = 100L
    val o = t(s, d, "orders").select(col("o_custkey"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast(LongType).as("hot"))
    val cat = o.join(broadcast(t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nat"))
      .agg(count(lit(1)).as("n"), sum(col("hot")).as("conv"))
      .persistT
    val glob = cat.agg(sum(col("n")).as("na"), sum(col("conv")).as("ca"))
      .select(expr("ca * 1000000 div na").as("glob_ppm"))
    cat.crossJoin(broadcast(glob))
      .select(col("nat"), col("n"), col("conv"),
        expr("conv * 1000000 div n").as("raw_ppm"),
        expr(s"(conv * 1000000 + $m * glob_ppm) div (n + $m)").as("enc_ppm"),
        col("glob_ppm"))
      .sortedOut("nat")
  }

  private val q266Sql =
    """WITH cat AS (SELECT c.c_nationkey AS nat, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |g AS (SELECT CAST(sum(conv) * 1000000 // sum(n) AS BIGINT) AS glob_ppm FROM cat)
      |SELECT nat, n, conv,
      |  CAST(conv * 1000000 // n AS BIGINT) AS raw_ppm,
      |  CAST((conv * 1000000 + 100 * glob_ppm) // (n + 100) AS BIGINT) AS enc_ppm,
      |  glob_ppm
      |FROM cat CROSS JOIN g ORDER BY nat""".stripMargin

  // ------- A/B test sizing advisor (q267)
  /** Experimental-design pre-flight: for each market segment's
    * observed urgent-order base rate p₁ (ppm), the per-arm sample size
    * a two-proportion z-test needs to detect a 5% RELATIVE lift at
    * α=0.05 (two-sided) / 80% power —
    * `n = ⌈(z_α+z_β)²·(p₁(1−p₁)+p₂(1−p₂)) / (p₂−p₁)²⌉` with
    * z in exact milli-units (1960 + 842), every term integer ppm, and
    * the ceiling spelled `(num + den − 1) div den`. The advisor that
    * tells a team whether the experiment they want is even runnable on
    * their traffic before they burn a quarter on it (companion to
    * q234's post-hoc z² and q253's lift table).
    *
    * Scale shape: one broadcast dim join + one segment-grain
    * aggregate; the sizing arithmetic is a 5-row projection.
    * Magnitude: num ≤ 2802²·5·10¹¹ < 2⁶³ — fits BIGINT exactly. */
  private def q267(s: SparkSession, d: String): DataFrame = {
    val z2 = 2802L * 2802L // (1.960 + 0.842)² in milli-units²
    val o = t(s, d, "orders").select(col("o_custkey"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast(LongType).as("hot"))
    o.join(broadcast(t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_obs"), sum(col("hot")).as("conv"))
      .withColumn("p1_ppm", expr("conv * 1000000 div n_obs"))
      .withColumn("p2_ppm", expr("p1_ppm + p1_ppm div 20"))
      .withColumn("n_per_arm", expr(
        s"""CASE WHEN p2_ppm = p1_ppm THEN NULL ELSE
           |  ($z2 * (p1_ppm * (1000000 - p1_ppm) + p2_ppm * (1000000 - p2_ppm))
           |    + 1000000 * (p2_ppm - p1_ppm) * (p2_ppm - p1_ppm) - 1)
           |  div (1000000 * (p2_ppm - p1_ppm) * (p2_ppm - p1_ppm)) END"""
          .stripMargin))
      .select(col("segment"), col("n_obs"), col("p1_ppm"), col("p2_ppm"),
        col("n_per_arm"))
      .sortedOut("segment")
  }

  private val q267Sql =
    """WITH seg AS (SELECT c.c_mktsegment AS segment,
      |    CAST(count(*) AS BIGINT) AS n_obs,
      |    CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |p AS (SELECT segment, n_obs,
      |    CAST(conv * 1000000 // n_obs AS BIGINT) AS p1_ppm FROM seg),
      |p2 AS (SELECT segment, n_obs, p1_ppm,
      |    CAST(p1_ppm + p1_ppm // 20 AS BIGINT) AS p2_ppm FROM p)
      |SELECT segment, n_obs, p1_ppm, p2_ppm,
      |  CAST(CASE WHEN p2_ppm = p1_ppm THEN NULL ELSE
      |    (7851204 * (p1_ppm * (1000000 - p1_ppm) + p2_ppm * (1000000 - p2_ppm))
      |      + 1000000 * (p2_ppm - p1_ppm) * (p2_ppm - p1_ppm) - 1)
      |    // (1000000 * (p2_ppm - p1_ppm) * (p2_ppm - p1_ppm)) END AS BIGINT) AS n_per_arm
      |FROM p2 ORDER BY segment""".stripMargin

  // ------- equi-width histogram join-cardinality estimate (q269)
  /** The CBO-validation operator: estimate |orders ⋈ lineitem| from
    * B-bucket equi-width histograms of the join key exactly the way a
    * cost model does — `est = Σ_b o_b·l_b div width_b` (uniform,
    * one-row-per-value-within-bucket assumption) — and price the
    * estimate against the EXACT join cardinality in signed ppm error,
    * for B ∈ {16, 256}. This is the arithmetic behind every
    * broadcast-vs-shuffle and join-order decision; measuring its
    * realized error on the actual key distribution is how an engine
    * learns where its planner will be wrong.
    *
    * Scale shape: two map-side-combinable bucket censuses + one exact
    * count(*) of the key-join (itself one shuffle); the estimate math
    * runs on ≤ B rows. Every division is a floor `div` spelled
    * identically in the oracle. */
  private def q269(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_orderkey").as("k")).persistT
    val l = t(s, d, "lineitem").select(col("l_orderkey").as("k")).persistT
    val actual = o.join(l, Seq("k")).count()
    val bounds = o.agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect()(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    def estimate(b: Long): DataFrame = {
      val width = (hi - lo + b) / b // ceil((hi-lo+1)/b)
      def hist(df: DataFrame, cnt: String) =
        df.where(col("k").between(lo, hi))
          .groupBy(expr(s"(k - $lo) div $width").as("bucket"))
          .agg(count(lit(1)).as(cnt))
      hist(o, "ob").join(hist(l, "lb"), Seq("bucket"))
        .agg(sum(expr(s"ob * lb div $width")).as("est"))
        .select(lit(b).as("n_buckets"), col("est"),
          lit(actual).as("actual"),
          expr(s"(est - $actual) * 1000000 div $actual").as("err_ppm"))
    }
    estimate(16).unionByName(estimate(256)).sortedOut("n_buckets")
  }

  private val q269Sql = {
    def leg(b: Long): String =
      s"""SELECT CAST($b AS BIGINT) AS n_buckets,
         |  CAST(sum(ob * lb // w.width) AS BIGINT) AS est,
         |  (SELECT CAST(count(*) AS BIGINT) FROM orders o JOIN lineitem l
         |     ON o.o_orderkey = l.l_orderkey) AS actual,
         |  CAST((sum(ob * lb // w.width)
         |    - (SELECT count(*) FROM orders o JOIN lineitem l
         |         ON o.o_orderkey = l.l_orderkey)) * 1000000
         |    // (SELECT count(*) FROM orders o JOIN lineitem l
         |          ON o.o_orderkey = l.l_orderkey) AS BIGINT) AS err_ppm
         |FROM (
         |  SELECT oh.bucket, oh.ob, lh.lb FROM
         |    (SELECT (o_orderkey - r.lo) // ((r.hi - r.lo + $b) // $b) AS bucket,
         |            CAST(count(*) AS BIGINT) AS ob
         |     FROM orders CROSS JOIN r GROUP BY 1) oh
         |  JOIN
         |    (SELECT (l_orderkey - r.lo) // ((r.hi - r.lo + $b) // $b) AS bucket,
         |            CAST(count(*) AS BIGINT) AS lb
         |     FROM lineitem CROSS JOIN r
         |     WHERE l_orderkey BETWEEN r.lo AND r.hi GROUP BY 1) lh
         |  USING (bucket)) j
         |CROSS JOIN (SELECT (r.hi - r.lo + $b) // $b AS width FROM r) w
         |GROUP BY w.width""".stripMargin
    s"""WITH r AS MATERIALIZED (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders)
       |${leg(16)}
       |UNION ALL
       |${leg(256)}
       |ORDER BY n_buckets""".stripMargin
  }

  // ------- hash-bucket balance audit (q270)
  /** The LAYOUT companion to q256's shuffle-skew census: if lineitem
    * were bucketed by md5-60(l_orderkey) mod B (the engine-wide
    * oracle-reproducible hash — Spark's own murmur bucketing DuckDB
    * can't replay), how balanced are the buckets? Reports, for
    * B ∈ {32, 128}: the max/mean bucket mass in ppm, the largest
    * bucket, and the count of EMPTY buckets — the numbers that decide
    * whether bucketed co-located joins are safe or one bucket becomes
    * the straggler task.
    *
    * Scale shape: one map-side-combinable census per B; everything
    * after is ≤ B rows. */
  private def q270(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(graft.text.Hashing.h60(col("l_orderkey").cast("string")).as("h"))
      .persistT
    def leg(b: Long): DataFrame =
      li.groupBy(pmod(col("h"), lit(b)).as("bucket"))
        .agg(count(lit(1)).as("m"))
        .agg(sum(col("m")).as("n_rows"), count(lit(1)).as("n_nonempty"),
          max(col("m")).as("max_bucket"))
        .select(lit(b).as("n_buckets"),
          col("n_rows"), col("max_bucket"),
          (lit(b) - col("n_nonempty")).as("n_empty"),
          expr(s"max_bucket * $b * 1000000 div n_rows").as("max_over_mean_ppm"))
    leg(32).unionByName(leg(128)).sortedOut("n_buckets")
  }

  private val q270Sql = {
    def leg(b: Long): String =
      s"""SELECT CAST($b AS BIGINT) AS n_buckets,
         |  CAST(sum(m) AS BIGINT) AS n_rows,
         |  CAST(max(m) AS BIGINT) AS max_bucket,
         |  CAST($b - count(*) AS BIGINT) AS n_empty,
         |  CAST(max(m) * $b * 1000000 // sum(m) AS BIGINT) AS max_over_mean_ppm
         |FROM (SELECT CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % $b AS bucket,
         |        CAST(count(*) AS BIGINT) AS m
         |      FROM lineitem GROUP BY 1) g""".stripMargin
    s"""${leg(32)}
       |UNION ALL
       |${leg(128)}
       |ORDER BY n_buckets""".stripMargin
  }

  // ------- hierarchical share rollup (q271)
  /** Revenue shares down a 3-level hierarchy (region → nation →
    * market segment) with the consistency contract IN the output:
    * each row carries its share of parent AND share of grand total in
    * exact ppm, ppm remainders assigned to the lexicographically LAST
    * child so every parent's children sum to exactly 10⁶ — the
    * reporting-tree discipline (same remainder rule as q251's linear
    * attribution) that makes a drill-down UI's percentages add up.
    *
    * Scale shape: ONE fact-grain aggregate at the leaf grain, two
    * bounded-axis rollups, windows only over domain-bounded sibling
    * sets. */
  private def q271(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leaf = t(s, d, "orders")
      .join(broadcast(t(s, d, "customer").select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey"),
        col("n_regionkey"))), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("region"), col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("cents"))
      .persistT
    def shares(df: DataFrame, parentW: org.apache.spark.sql.expressions.WindowSpec,
               ord: org.apache.spark.sql.Column): DataFrame =
      // floor share for every sibling; the LAST sibling (by ord desc)
      // absorbs 10⁶ − Σ(other floors) so siblings sum exactly
      df.withColumn("pt", sum(col("cents")).over(parentW))
        .withColumn("fl", expr("cents * 1000000 div pt"))
        .withColumn("sf", sum(col("fl")).over(parentW))
        .withColumn("rk", row_number().over(parentW.orderBy(ord.desc)))
        .withColumn("share_parent_ppm",
          when(col("rk") === 1, lit(1000000L) - col("sf") + col("fl"))
            .otherwise(col("fl")))
        .drop("pt", "fl", "sf", "rk")
    val nat = shares(
      leaf.groupBy(col("region"), col("nation")).agg(sum(col("cents")).as("cents")),
      Window.partitionBy(col("region")), col("nation"))
      .select(col("region"), col("nation"), lit(null).cast("string").as("segment"),
        lit("nation").as("level"), col("cents"), col("share_parent_ppm"))
    val seg = shares(leaf, Window.partitionBy(col("region"), col("nation")),
        col("segment"))
      .select(col("region"), col("nation"), col("segment"),
        lit("segment").as("level"), col("cents"), col("share_parent_ppm"))
    nat.unionByName(seg)
      .sortedOut("level", "region", "nation", "segment")
  }

  private val q271Sql =
    """WITH leaf AS MATERIALIZED (SELECT n.n_regionkey AS region,
      |    c.c_nationkey AS nation, c.c_mktsegment AS segment,
      |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2, 3),
      |nat0 AS (SELECT region, nation, CAST(sum(cents) AS BIGINT) AS cents
      |  FROM leaf GROUP BY 1, 2),
      |nat1 AS (SELECT region, nation, cents,
      |    cents * 1000000 // sum(cents) OVER (PARTITION BY region) AS fl
      |  FROM nat0),
      |nat AS (SELECT region, nation, CAST(NULL AS VARCHAR) AS segment,
      |    'nation' AS level, cents,
      |    CAST(CASE WHEN row_number() OVER (PARTITION BY region ORDER BY nation DESC) = 1
      |      THEN 1000000 - sum(fl) OVER (PARTITION BY region) + fl
      |      ELSE fl END AS BIGINT) AS share_parent_ppm
      |  FROM nat1),
      |seg1 AS (SELECT region, nation, segment, cents,
      |    cents * 1000000 // sum(cents) OVER (PARTITION BY region, nation) AS fl
      |  FROM leaf),
      |seg AS (SELECT region, nation, segment, 'segment' AS level, cents,
      |    CAST(CASE WHEN row_number() OVER (PARTITION BY region, nation ORDER BY segment DESC) = 1
      |      THEN 1000000 - sum(fl) OVER (PARTITION BY region, nation) + fl
      |      ELSE fl END AS BIGINT) AS share_parent_ppm
      |  FROM seg1)
      |SELECT region, nation, segment, level, cents, share_parent_ppm
      |FROM (SELECT * FROM nat UNION ALL SELECT * FROM seg) u
      |ORDER BY level, region, nation, segment""".stripMargin

  // ------- Mann–Kendall monotone-trend test (q272)
  /** IS each event stream's daily volume monotonically drifting? The
    * nonparametric companion to q218 (WHERE did it shift) and q254
    * (HOW is it trending): S = Σ_{i<j} sgn(c_j − c_i) over day pairs,
    * with the tie-corrected variance
    * 18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5) kept as the INTEGER var18,
    * continuity-corrected significance as the pure-integer gate
    * 18·10⁴·(|S|−1)² > 38416·var18 (z² > 1.96², no IEEE anywhere),
    * and the direction sign. Rank-based: immune to the outlier days
    * that poison a least-squares slope — the screen that decides
    * whether q273's Sen slope is worth reading.
    *
    * Scale shape: ONE map-side (type, day) rollup, then a day-pair
    * self-join that is O(d²) per type over CALENDAR DAYS — domain-
    * bounded like q244's paired days (a decade is ~6.7M pairs/type),
    * never data-sized; the tie census is a second bounded rollup. */
  private def q272(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
      .persistT
    val b = daily.select(col("et").as("et2"), col("day").as("d2"),
      col("c").as("c2"))
    val sPairs = daily
      .join(b, col("et") === col("et2") && col("day") < col("d2"))
      .groupBy(col("et"))
      .agg(sum(when(col("c2") > col("c"), 1L)
          .when(col("c2") < col("c"), -1L).otherwise(0L)).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val ties = daily.groupBy(col("et"), col("c")).agg(count(lit(1)).as("tk"))
      .groupBy(col("et"))
      .agg(sum(col("tk")).as("n_days"),
        sum(col("tk") * (col("tk") - 1) * (col("tk") * 2 + 5)).as("tie_term"))
    sPairs.join(ties, Seq("et"))
      .withColumn("var18",
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"))
      .withColumn("u", greatest(abs(col("s_stat")) - 1, lit(0L)))
      .select(col("et").as("event_type"), col("n_days"), col("n_pairs"),
        col("s_stat"), col("var18"),
        // 180000·u² cleared through DECIMAL(38,0) (q244/q248 discipline;
        // ADVICE r11): u ≈ d²/2, so past ~3,780 distinct days BIGINT
        // wraps (Spark) / errors (DuckDB) and flips the gate. DECIMAL
        // holds to u ~ 7·10¹⁶ — far beyond any calendar-day domain.
        (col("var18") > 0 &&
          expr("CAST(180000 AS DECIMAL(38,0)) * u * u > CAST(38416 AS DECIMAL(38,0)) * var18")).as("trending"),
        when(col("s_stat") > 0, 1L).when(col("s_stat") < 0, -1L)
          .otherwise(0L).as("direction"))
      .sortedOut("event_type")
  }

  private val q272Sql =
    """WITH daily AS MATERIALIZED (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |p AS (SELECT a.et,
      |    CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
      |    CAST(count(*) AS BIGINT) AS n_pairs
      |  FROM daily a JOIN daily b ON a.et = b.et AND a.day < b.day GROUP BY 1),
      |t AS (SELECT et, CAST(sum(tk) AS BIGINT) AS n_days,
      |    CAST(sum(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT et, c, CAST(count(*) AS BIGINT) AS tk FROM daily GROUP BY 1, 2) g
      |  GROUP BY 1),
      |v AS (SELECT p.et, n_days, n_pairs, s_stat,
      |    n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18,
      |    greatest(abs(s_stat) - 1, 0) AS u
      |  FROM p JOIN t USING (et))
      |SELECT et AS event_type, n_days, n_pairs, s_stat, var18,
      |  var18 > 0 AND 180000 * CAST(u AS HUGEINT) * u > 38416 * CAST(var18 AS HUGEINT) AS trending,
      |  CAST(CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END AS BIGINT) AS direction
      |FROM v ORDER BY event_type""".stripMargin

  // ------- Theil–Sen robust slope in integer micro-units (q273)
  /** HOW FAST is each stream drifting, robustly: the Sen slope — the
    * lower MEDIAN of all pairwise slopes (c_j − c_i)/(day_j − day_i) —
    * in exact micro-events-per-day: each pair's slope quantizes to
    * `(Δc·10⁶) div Δday` — TRUNCATING division, which BIGINT `//`
    * also is in DuckDB (measured: −7//2 = −3; the floor-vs-trunc
    * distinction only bites negative slopes, and both spellings are
    * monotone so the median is stable either way) — then the q233
    * lower-median gate
    * (min v with 2·cumf ≥ n) picks the estimator. Up to 29% outlier
    * days cannot move it — the robust twin of q203's per-group OLS
    * slope, paired with q272's significance screen.
    *
    * Scale shape: the same domain-bounded O(d²/type) day-pair join as
    * q272; the median census window partitions by type over slope
    * VALUES (≤ pairs/type rows) — never a data-sized window. */
  private def q273(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
      .persistT
    val b = daily.select(col("et").as("et2"), col("day").as("d2"),
      col("c").as("c2"))
    val pairs = daily
      .join(b, col("et") === col("et2") && col("day") < col("d2"))
      .select(col("et"),
        ((col("c2") - col("c")) * 1000000L).as("num"),
        datediff(col("d2"), col("day")).cast(LongType).as("den"))
      .select(col("et"), expr("num div den").as("slope_micro"))
      .persistT
    val med = pairs.groupBy(col("et"), col("slope_micro").as("v"))
      .agg(count(lit(1)).as("f"))
      .withColumn("cumf", sum(col("f")).over(
        Window.partitionBy("et").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("np", sum(col("f")).over(Window.partitionBy("et")))
      .where(col("cumf") * 2 >= col("np"))
      .groupBy("et")
      .agg(min(col("v")).as("sen_slope_micro"), max(col("np")).as("n_pairs"))
    val ext = pairs.groupBy("et")
      .agg(min(col("slope_micro")).as("min_slope_micro"),
        max(col("slope_micro")).as("max_slope_micro"))
    val nd = daily.groupBy("et").agg(count(lit(1)).as("n_days"))
    med.join(ext, Seq("et")).join(nd, Seq("et"))
      .select(col("et").as("event_type"), col("n_days"), col("n_pairs"),
        col("sen_slope_micro"), col("min_slope_micro"), col("max_slope_micro"))
      .sortedOut("event_type")
  }

  private val q273Sql =
    """WITH daily AS MATERIALIZED (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |pr AS MATERIALIZED (SELECT a.et,
      |    ((b.c - a.c) * 1000000) // date_diff('day', a.day, b.day) AS slope_micro
      |  FROM daily a JOIN daily b ON a.et = b.et AND a.day < b.day),
      |cen AS (SELECT et, slope_micro AS v, CAST(count(*) AS BIGINT) AS f
      |  FROM pr GROUP BY 1, 2),
      |cum AS (SELECT et, v, f,
      |    CAST(sum(f) OVER (PARTITION BY et ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumf,
      |    CAST(sum(f) OVER (PARTITION BY et) AS BIGINT) AS np FROM cen),
      |med AS (SELECT et, CAST(min(v) AS BIGINT) AS sen_slope_micro,
      |    CAST(max(np) AS BIGINT) AS n_pairs
      |  FROM cum WHERE cumf * 2 >= np GROUP BY 1),
      |ext AS (SELECT et, CAST(min(slope_micro) AS BIGINT) AS min_slope_micro,
      |    CAST(max(slope_micro) AS BIGINT) AS max_slope_micro FROM pr GROUP BY 1),
      |nd AS (SELECT et, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1)
      |SELECT med.et AS event_type, n_days, n_pairs, sen_slope_micro,
      |  min_slope_micro, max_slope_micro
      |FROM med JOIN ext USING (et) JOIN nd USING (et) ORDER BY event_type""".stripMargin

  // ------- Sen-slope confidence band (q284)
  /** The confidence interval around q273's Sen slope (Gilbert 1987):
    * C = z·√(Var S) with the same tie-corrected integer var18 as q272
    * (Var S = var18/18), lower/upper band = the slopes at ranks
    * max(1, ⌊(N−C)/2⌋) and min(N, ⌈(N+C)/2⌉+1) among the N pairwise
    * slopes — rank selection by the q233/q273 cumulative-census gate,
    * never a sort-the-world. z = 1.96 and the √ are the only IEEE
    * steps; both engines compute the identical correctly-rounded
    * doubles, so the integer ranks — and therefore the integer band
    * endpoints — are bit-equal. A band excluding 0 is the
    * estimate-side read of q272's significance screen; the width is
    * what a capacity planner propagates.
    *
    * Scale shape: the same domain-bounded O(d²/type) day-pair join as
    * q272/q273; the rank census is value-grain (≤ pairs/type rows). */
  private def q284(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
      .persistT
    val v18 = daily.groupBy(col("et"), col("c")).agg(count(lit(1)).as("tk"))
      .groupBy(col("et"))
      .agg(sum(col("tk")).as("n_days"),
        sum(col("tk") * (col("tk") - 1) * (col("tk") * 2 + 5)).as("tie_term"))
      .withColumn("var18",
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"))
      .select(col("et"), col("var18"))
    val b = daily.select(col("et").as("et2"), col("day").as("d2"),
      col("c").as("c2"))
    val cen = daily
      .join(b, col("et") === col("et2") && col("day") < col("d2"))
      .select(col("et"),
        expr("((c2 - c) * 1000000) div datediff(d2, day)").as("v"))
      .groupBy(col("et"), col("v")).agg(count(lit(1)).as("f"))
      .withColumn("cumf", sum(col("f")).over(
        Window.partitionBy("et").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("np", sum(col("f")).over(Window.partitionBy("et")))
      .persistT
    val cAlpha = lit(1.96) * sqrt(col("var18").cast("double") / 18.0)
    val rk = cen.select(col("et"), col("np")).distinct()
      .join(v18, Seq("et"))
      .withColumn("lo_rank", greatest(lit(1L),
        floor((col("np") - cAlpha) / 2).cast("long")))
      .withColumn("hi_rank", least(col("np"),
        ceil((col("np") + cAlpha) / 2).cast("long") + 1))
    val lo = cen.join(rk.select(col("et"), col("lo_rank")), Seq("et"))
      .where(col("cumf") >= col("lo_rank"))
      .groupBy("et").agg(min(col("v")).as("sen_lo_micro"))
    val hi = cen.join(rk.select(col("et"), col("hi_rank")), Seq("et"))
      .where(col("cumf") >= col("hi_rank"))
      .groupBy("et").agg(min(col("v")).as("sen_hi_micro"))
    rk.join(lo, Seq("et")).join(hi, Seq("et"))
      .select(col("et").as("event_type"), col("np").as("n_pairs"),
        col("var18"), col("lo_rank"), col("hi_rank"),
        col("sen_lo_micro"), col("sen_hi_micro"))
      .sortedOut("event_type")
  }

  private val q284Sql =
    """WITH daily AS MATERIALIZED (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |t AS (SELECT et, CAST(sum(tk) AS BIGINT) AS n_days,
      |    CAST(sum(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT et, c, CAST(count(*) AS BIGINT) AS tk FROM daily GROUP BY 1, 2) g
      |  GROUP BY 1),
      |v18 AS (SELECT et, n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18 FROM t),
      |cen AS (SELECT et, v, CAST(count(*) AS BIGINT) AS f FROM (
      |    SELECT a.et, ((b.c - a.c) * 1000000) // date_diff('day', a.day, b.day) AS v
      |    FROM daily a JOIN daily b ON a.et = b.et AND a.day < b.day) pr
      |  GROUP BY 1, 2),
      |cum AS MATERIALIZED (SELECT et, v, f,
      |    CAST(sum(f) OVER (PARTITION BY et ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumf,
      |    CAST(sum(f) OVER (PARTITION BY et) AS BIGINT) AS np FROM cen),
      |rk AS (SELECT n.et, np, var18,
      |    CAST(greatest(1, CAST(floor((np - 1.96 * sqrt(CAST(var18 AS DOUBLE) / 18.0)) / 2) AS BIGINT)) AS BIGINT) AS lo_rank,
      |    CAST(least(np, CAST(ceil((np + 1.96 * sqrt(CAST(var18 AS DOUBLE) / 18.0)) / 2) AS BIGINT) + 1) AS BIGINT) AS hi_rank
      |  FROM (SELECT DISTINCT et, np FROM cum) n JOIN v18 USING (et)),
      |lo AS (SELECT c.et, CAST(min(v) AS BIGINT) AS sen_lo_micro
      |  FROM cum c JOIN rk ON c.et = rk.et AND c.cumf >= rk.lo_rank GROUP BY 1),
      |hi AS (SELECT c.et, CAST(min(v) AS BIGINT) AS sen_hi_micro
      |  FROM cum c JOIN rk ON c.et = rk.et AND c.cumf >= rk.hi_rank GROUP BY 1)
      |SELECT rk.et AS event_type, np AS n_pairs, var18, lo_rank, hi_rank,
      |  sen_lo_micro, sen_hi_micro
      |FROM rk JOIN lo ON lo.et = rk.et JOIN hi ON hi.et = rk.et
      |ORDER BY event_type""".stripMargin

  // ------- join-order advisor (q285)
  /** The ORDER member of the advisor family (q256 skew, q264
    * broadcast, q269 cardinality, q259 watermark): for the 3-table
    * chain customer'(BUILDING) — orders — lineitem'(returnflag R),
    * estimate both candidate first-join intermediates from 256-bucket
    * equi-width key histograms (the q269 arithmetic: Σ a_b·b_b div
    * width), pick the smaller, and price the pick against the EXACT
    * intermediate counts — did the histogram arithmetic choose the
    * order a CBO should? Ties break toward order a (≤), identically
    * in both engines; every estimate is the q269 integer form, so the
    * advisor's decision is bit-reproducible.
    *
    * Scale shape: two histogram aggregates per candidate (map-side
    * combinable, ≤256 rows each) + the two exact joins it audits;
    * driver holds only four scalars. In production the exact legs
    * drop and the advisor is pure metadata arithmetic. */
  private def q285(s: SparkSession, d: String): DataFrame = {
    val B = 256L
    val cust = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).persistT
    val ordC = t(s, d, "orders").select(col("o_custkey").as("k")).persistT
    val ordO = t(s, d, "orders").select(col("o_orderkey").as("k")).persistT
    val li = t(s, d, "lineitem").where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k")).persistT
    def estExact(a: DataFrame, b: DataFrame): (Long, Long) = {
      val r = a.agg(min(col("k")).as("lo"), max(col("k")).as("hi")).collect()(0)
      // empty filtered side (ADVICE r12 #4): min/max aggregate to NULL
      // and getLong would throw — est and exact are both 0, matching
      // the oracle's NULL-bucket algebra (NULL buckets join nothing,
      // coalesce(est) = 0, and the exact join of an empty side is 0)
      if (r.isNullAt(0)) (0L, 0L)
      else {
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        val width = (hi - lo + B) / B
        def hist(df: DataFrame, c: String) =
          df.where(col("k").between(lo, hi))
            .groupBy(expr(s"(k - $lo) div $width").as("bucket"))
            .agg(count(lit(1)).as(c))
        val est = hist(a, "ab").join(hist(b, "bb"), Seq("bucket"))
          .agg(coalesce(sum(expr(s"ab * bb div $width")), lit(0L)))
          .collect()(0).getLong(0)
        (est, a.join(b, Seq("k")).count())
      }
    }
    val (estA, exactA) = estExact(cust, ordC)
    val (estB, exactB) = estExact(ordO, li)
    val pickA = estA <= estB
    val correct = pickA == (exactA <= exactB)
    import s.implicits._
    Seq(
      ("a_cust_orders_first", estA, exactA, pickA, correct),
      ("b_orders_lineitem_first", estB, exactB, !pickA, correct))
      .toDF("join_order", "est_rows", "exact_rows", "picked", "pick_correct")
      .sortedOut("join_order")
  }

  private val q285Sql =
    """WITH ra AS (SELECT min(c_custkey) AS lo,
      |    (max(c_custkey) - min(c_custkey) + 256) // 256 AS w,
      |    max(c_custkey) AS hi
      |  FROM customer WHERE c_mktsegment = 'BUILDING'),
      |ca AS (SELECT (c_custkey - ra.lo) // ra.w AS bucket, CAST(count(*) AS BIGINT) AS ab
      |  FROM customer CROSS JOIN ra WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
      |oa AS (SELECT (o_custkey - ra.lo) // ra.w AS bucket, CAST(count(*) AS BIGINT) AS bb
      |  FROM orders CROSS JOIN ra WHERE o_custkey BETWEEN ra.lo AND ra.hi GROUP BY 1),
      |ea AS (SELECT CAST(coalesce(sum(ab * bb // ra.w), 0) AS BIGINT) AS est
      |  FROM ca JOIN oa USING (bucket) CROSS JOIN ra),
      |xa AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM customer c
      |  JOIN orders o ON c.c_custkey = o.o_custkey
      |  WHERE c.c_mktsegment = 'BUILDING'),
      |rb AS (SELECT min(o_orderkey) AS lo,
      |    (max(o_orderkey) - min(o_orderkey) + 256) // 256 AS w,
      |    max(o_orderkey) AS hi FROM orders),
      |ob AS (SELECT (o_orderkey - rb.lo) // rb.w AS bucket, CAST(count(*) AS BIGINT) AS ab
      |  FROM orders CROSS JOIN rb GROUP BY 1),
      |lb AS (SELECT (l_orderkey - rb.lo) // rb.w AS bucket, CAST(count(*) AS BIGINT) AS bb
      |  FROM lineitem CROSS JOIN rb
      |  WHERE l_returnflag = 'R' AND l_orderkey BETWEEN rb.lo AND rb.hi GROUP BY 1),
      |eb AS (SELECT CAST(coalesce(sum(ab * bb // rb.w), 0) AS BIGINT) AS est
      |  FROM ob JOIN lb USING (bucket) CROSS JOIN rb),
      |xb AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM orders o
      |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  WHERE l.l_returnflag = 'R')
      |SELECT 'a_cust_orders_first' AS join_order, ea.est AS est_rows,
      |  xa.exact AS exact_rows, ea.est <= eb.est AS picked,
      |  (ea.est <= eb.est) = (xa.exact <= xb.exact) AS pick_correct
      |FROM ea, eb, xa, xb
      |UNION ALL
      |SELECT 'b_orders_lineitem_first', eb.est, xb.exact,
      |  NOT (ea.est <= eb.est),
      |  (ea.est <= eb.est) = (xa.exact <= xb.exact)
      |FROM ea, eb, xa, xb
      |ORDER BY join_order""".stripMargin

  // ------- join-order advisor served from standing stats indexes (q307)
  /** q285 re-grounded as PURE INDEX ARITHMETIC (the q304 discipline
    * applied to the ORDER member of the advisor family): each join
    * side's key distribution is a standing [[graft.ops.StatsIndex]] —
    * customer(BUILDING).c_custkey, orders.o_custkey, orders.o_orderkey,
    * lineitem(R).l_orderkey — and BOTH the 256-bucket equi-width
    * estimates and the EXACT intermediate counts fold from the
    * per-value frames (exact = Σ cnt_a·cnt_b over joined value grains),
    * so the advisor's pick and its price check run without touching a
    * fact table. The oracle is q285's SQL VERBATIM: index-served must
    * reproduce the from-scratch advisor bit-for-bit, the q283/q280
    * shared-oracle pattern.
    *
    * Scale shape: serving cost ∝ the keys' NDV (the value frames),
    * never table rows; each estimate is a ≤256-row rollup; each exact
    * leg one value-grain join. In production the indexes ride the
    * ingest path and the CBO question "which first join is smaller"
    * is answered from metadata alone. */
  private def q307(s: SparkSession, d: String): DataFrame = {
    val B = 256L
    val tag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
    def idx(name: String, df: DataFrame, key: String): String = {
      val n = s"q307_stx_${name}_$tag"
      val marker = n + "_built"
      if (!s.catalog.tableExists(marker)) {
        graft.ops.StatsIndex.write(df.select(lit("col:k").as("stat_key"),
          col(key).cast(DoubleType).as("nv"), lit(null: String).as("sv")), n)
        s.range(1).createOrReplaceTempView(marker)
      }
      n
    }
    val cb = idx("cb", t(s, d, "customer").where(col("c_mktsegment") === "BUILDING"), "c_custkey")
    val oc = idx("oc", t(s, d, "orders"), "o_custkey")
    val oo = idx("oo", t(s, d, "orders"), "o_orderkey")
    val lr = idx("lr", t(s, d, "lineitem").where(col("l_returnflag") === "R"), "l_orderkey")
    def vals(n: String, c: String) = graft.ops.StatsIndex.liveValues(s, n)
      .where(col("nv").isNotNull)
      .select(col("nv").cast(LongType).as("k"), col("cnt").as(c))
    def estExact(aN: String, bN: String): (Long, Long) = {
      val av = vals(aN, "ac").persistT
      val bv = vals(bN, "bc").persistT
      val r = av.agg(min(col("k")).as("lo"), max(col("k")).as("hi")).collect()(0)
      if (r.isNullAt(0)) (0L, 0L)
      else {
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        val width = (hi - lo + B) / B
        def hist(df: DataFrame, cnt: String, as: String) =
          df.where(col("k").between(lo, hi))
            .groupBy(expr(s"(k - $lo) div $width").as("bucket"))
            .agg(sum(col(cnt)).cast(LongType).as(as))
        val est = hist(av, "ac", "ab").join(hist(bv, "bc", "bb"), Seq("bucket"))
          .agg(coalesce(sum(expr(s"ab * bb div $width")), lit(0L)).cast(LongType))
          .collect()(0).getLong(0)
        val exact = av.join(bv, Seq("k"))
          .agg(coalesce(sum(col("ac") * col("bc")), lit(0L)).cast(LongType))
          .collect()(0).getLong(0)
        (est, exact)
      }
    }
    val (estA, exactA) = estExact(cb, oc)
    val (estB, exactB) = estExact(oo, lr)
    val pickA = estA <= estB
    val correct = pickA == (exactA <= exactB)
    import s.implicits._
    Seq(
      ("a_cust_orders_first", estA, exactA, pickA, correct),
      ("b_orders_lineitem_first", estB, exactB, !pickA, correct))
      .toDF("join_order", "est_rows", "exact_rows", "picked", "pick_correct")
      .sortedOut("join_order")
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q307_index_join_order_advisor", q307 _, Some(q285Sql)),
    ("q238_gini_spend",      q238 _, Some(q238Sql)),
    ("q239_time_weighted_value", q239 _, Some(q239Sql)),
    ("q240_dau_wau_mau",     q240 _, Some(q240Sql)),
    ("q243_bot_screen",      q243 _, Some(q243Sql)),
    ("q244_sign_test",       q244 _, Some(q244Sql)),
    ("q247_fd_discovery",    q247 _, Some(q247Sql)),
    ("q249_order_violations", q249 _, Some(q249Sql)),
    ("q250_kcore_backbone",  q250 _, Some(q250Sql)),
    ("q251_attribution_panel", q251 _, Some(q251Sql)),
    ("q253_decile_lift",     q253 _, Some(q253Sql)),
    ("q254_holt_trend",      q254 _, Some(q254Sql)),
    ("q255_t_closeness",     q255 _, Some(q255Sql)),
    ("q256_join_skew_advisor", q256 _, Some(q256Sql)),
    ("q257_bfs_reach",       q257 _, Some(q257Sql)),
    ("q258_r2_matrix",       q258 _, Some(q258Sql)),
    ("q259_watermark_advisor", q259 _, Some(q259Sql)),
    ("q260_rfm_segments",    q260 _, Some(q260Sql)),
    ("q261_event_trigrams",  q261 _, Some(q261Sql)),
    ("q262_sample_bias",     q262 _, Some(q262Sql)),
    ("q263_peak_concurrency", q263 _, Some(q263Sql)),
    ("q264_broadcast_advisor", q264 _, Some(q264Sql)),
    ("q265_nzv_screen",      q265 _, Some(q265Sql)),
    ("q266_target_encoding", q266 _, Some(q266Sql)),
    ("q267_ab_sizing",       q267 _, Some(q267Sql)),
    ("q269_hist_cardinality", q269 _, Some(q269Sql)),
    ("q270_bucket_balance",  q270 _, Some(q270Sql)),
    ("q271_share_rollup",    q271 _, Some(q271Sql)),
    ("q272_mann_kendall",    q272 _, Some(q272Sql)),
    ("q273_sen_slope",       q273 _, Some(q273Sql)),
    ("q284_sen_ci",          q284 _, Some(q284Sql)),
    ("q285_join_order_advisor", q285 _, Some(q285Sql)))
}

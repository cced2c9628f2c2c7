package graft.queries

import graft.ops.TrackedCache.TrackOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.RelationalOps
import graft.sim.IvfIndex
import graft.text.TextFunctions

/** Second wave of operator coverage: pivot, cube, exact percentiles,
  * as-of join, batch sessionization, union-by-name, token UDTF,
  * approximate distinct, IVF ANN. Timestamps are exported as epoch
  * millis (BIGINT) on both sides — the fixture's TIMESTAMP(NANOS)
  * column would otherwise hash-mismatch on unit alone.
  */
object ExtendedQueries {
  import ParityQueries.{Q, SortedOutOps}

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  private def d184(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
  /** Final output cast: exact decimal → double (ParityQueries policy). */
  private def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  // ------------------------------------------------------------- pivot
  private def q39(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dbl(sum(d184(col("o_totalprice")))))
      .sortedOut("yr")

  private val q39Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      | CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
      | CAST(sum(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
      | CAST(sum(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  // -------------------------------------------------------------- cube
  private def q40(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           dbl(sum(d184(col("l_discount")))).as("sum_disc"))
      .sortedOut(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q40Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      | CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------ exact percentiles
  /** Exact interpolated percentiles over an int column — both engines
    * interpolate in double from exact ints, so values agree bitwise.
    *
    * SCALE CAVEAT: Spark's exact `percentile` collects every value of
    * the group into ONE aggregation buffer — here bounded by the
    * per-brand group size, but a production pipeline over unbounded
    * groups uses `approx_percentile` (mergeable constant-memory
    * sketch); this exact form is the verification twin, the same
    * exact-vs-sketch split CountMin documents for heavy hitters. */
  private def q41(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .groupBy("p_brand")
      .agg(percentile(col("p_size"), lit(0.5)).cast(DecimalType(18, 6)).cast(DoubleType).as("median_size"),
           percentile(col("p_size"), lit(0.9)).cast(DecimalType(18, 6)).cast(DoubleType).as("p90_size"),
           count(lit(1)).as("n"))
      .sortedOut("p_brand")

  private val q41Sql =
    """SELECT p_brand,
      | CAST(CAST(quantile_cont(p_size, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS median_size,
      | CAST(CAST(quantile_cont(p_size, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90_size,
      | count(*) AS n
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ------------------------- mergeable quantile sketch + contract (q186)
  /** The QUANTILE member of the sketch family (HLL distinct q46/q55,
    * Count-Min frequency q81, Bloom membership q102): Spark's
    * `percentile_approx` (KLL-style mergeable sketch — per-partition
    * sketches, map-side combined, constant memory) at accuracy 1000,
    * VERIFIED IN-PLAN against exact ranks: a reported value v for
    * percentile p must satisfy
    * `count(x < v) ≤ p·N + N/acc` and `count(x ≤ v) ≥ p·N − N/acc`
    * (the sketch's rank-error guarantee). Sketch values themselves are
    * implementation-defined, so — the q46/q55 discipline — the output
    * carries the CONTRACT booleans plus the exact percentiles through
    * the q41 DECIMAL(18,6) bridge, never the raw sketch values.
    *
    * Scale shape: this is what replaces q41's exact sort-based
    * percentile at 100 TB — the sketch pass ships ~O(acc) counters per
    * partition instead of buffering the column; the exact pass here is
    * the fixture-scale verification twin. */
  private def q186(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_extendedprice").cast(DoubleType).as("x")).persistT
    val sk = li.agg(
      percentile_approx(col("x"), array(lit(0.5), lit(0.95), lit(0.99)),
        lit(1000)).as("approx"),
      count(lit(1)).as("n"))
      .select(element_at(col("approx"), 1).as("v50"),
        element_at(col("approx"), 2).as("v95"),
        element_at(col("approx"), 3).as("v99"), col("n"))
    val eps = 0.001 // 1/accuracy
    def ok(p: Double, v: String) =
      (sum(when(col("x") < col(v), 1L).otherwise(0L)).cast(DoubleType)
        <= lit(p) * col("n") + lit(eps) * col("n")) &&
      (sum(when(col("x") <= col(v), 1L).otherwise(0L)).cast(DoubleType)
        >= lit(p) * col("n") - lit(eps) * col("n"))
    // ONE percentile buffer for all three points (array form) — three
    // scalar percentile aggregates buffer the column three times (the
    // q83 lesson; measured 5.8 s → the array form collapses it)
    val exact = li.agg(percentile(col("x"),
        array(lit(0.5), lit(0.95), lit(0.99))).as("ps"))
      .select(
        element_at(col("ps"), 1).cast(DecimalType(18, 6)).cast(DoubleType).as("exact_p50"),
        element_at(col("ps"), 2).cast(DecimalType(18, 6)).cast(DoubleType).as("exact_p95"),
        element_at(col("ps"), 3).cast(DecimalType(18, 6)).cast(DoubleType).as("exact_p99"))
    li.crossJoin(broadcast(sk))
      .groupBy(col("n"))
      .agg(ok(0.5, "v50").as("sk50_ok"), ok(0.95, "v95").as("sk95_ok"),
        ok(0.99, "v99").as("sk99_ok"))
      .crossJoin(broadcast(exact))
      .select(col("n"), col("exact_p50"), col("exact_p95"), col("exact_p99"),
        col("sk50_ok"), col("sk95_ok"), col("sk99_ok"))
  }

  private val q186Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      | CAST(CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS exact_p50,
      | CAST(CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS DECIMAL(18,6)) AS DOUBLE) AS exact_p95,
      | CAST(CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99) AS DECIMAL(18,6)) AS DOUBLE) AS exact_p99,
      | true AS sk50_ok, true AS sk95_ok, true AS sk99_ok
      |FROM lineitem""".stripMargin

  // ------------------------------------------------------ as-of join
  /** Attribution as-of: for each purchase event, the latest click of the
    * same user at or before it (union+window — no fan-out join). */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    RelationalOps.asofJoinLatest(purchases, clicks, "user_id", "ts", "ts",
        rightCols = Seq("ts", "event_id"))
      .where(col("asof").isNotNull)
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_millis(col("ts")).as("p_ms"),
        col("asof.event_id").as("c_id"),
        unix_millis(col("asof.ts")).as("c_ms"))
      .sortedOutWide("p_id")
  }

  private val q42Sql =
    """SELECT user_id, p_id, p_ms, c_id, c_ms FROM (
      | SELECT p.user_id, p.event_id AS p_id, epoch_ms(p.ts) AS p_ms,
      |        c.event_id AS c_id, epoch_ms(c.ts) AS c_ms,
      |        row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
      | FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      | JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |   ON c.user_id = p.user_id AND c.ts <= p.ts)
      |WHERE rn = 1 ORDER BY p_id""".stripMargin

  // ------------------------------------------- batch sessionization
  /** Gap-based sessions via lag + running sum — the oracled batch twin
    * of streaming.EventsStream.sessionizeStream (30-minute gap). */
  private def q43(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMs = 30 * 60000L
    val withNew = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > gapMs, 1)
          .otherwise(0))
    withNew
      .withColumn("sid", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(unix_millis(col("ts"))).as("start_ms"),
           max(unix_millis(col("ts"))).as("end_ms"),
           count(lit(1)).as("n_events"),
           dbl(sum(d184(col("value")))).as("sum_value"))
      .sortedOutWide("user_id", "sid")
  }

  private val q43Sql =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      |  FROM events),
      |y AS (
      |  SELECT *, CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM y)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid, min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM z GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin

  // ------------------------------------------------- union by name
  private def q44(s: SparkSession, d: String): DataFrame = {
    val big = t(s, d, "orders").where(col("o_totalprice") > 250000)
      .select(col("o_orderkey").as("k"), lit("big").as("tag"), col("o_totalprice").as("price"))
    val urgent = t(s, d, "orders").where(col("o_orderpriority") === "1-URGENT")
      .select(lit("urgent").as("tag"), col("o_totalprice").as("price"), col("o_orderkey").as("k"))
    big.unionByName(urgent).sortedOutWide("k", "tag")
  }

  private val q44Sql =
    """SELECT * FROM (
      | SELECT o_orderkey AS k, 'big' AS tag, o_totalprice AS price
      | FROM orders WHERE o_totalprice > 250000
      | UNION ALL BY NAME
      | SELECT 'urgent' AS tag, o_totalprice AS price, o_orderkey AS k
      | FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY k, tag""".stripMargin

  // --------------------------------------------- token explode (UDTF)
  private def q45(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(20)

  private val q45Sql =
    """SELECT tok, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok FROM documents)
      |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin

  // --------------------------------- approximate distinct (HLL++) —
  // approx values differ per sketch impl, so the sketch value itself
  // can't be hashed against DuckDB; instead the query OUTPUTS the exact
  // count plus a within-3-sigma (15% = 3x the 5% rsd) relative-error flag over the approx value.
  // The oracle asserts the flag true: the HLL++ accuracy contract is
  // verified, the sketch-specific value stays out of the hash.
  private def q46(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
           countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) /
          col("exact_users") <= lit(0.15)).as("within_bounds"))
      .sortedOut("event_type")

  private val q46Sql =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS within_bounds
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- IVF ANN
  private def q47(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    new IvfIndex(nCells = 16, nProbe = 4)
      .annTopK(e, e.where(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .sortedOut("query_id", "rank")
  }

  /** The IVF search is fully deterministic (centroids are vec_id<16,
    * cosine is a bit-identical sequential fold on both engines), so the
    * whole assign→probe→search pipeline oracles exactly in SQL. */
  private val q47Sql = {
    def cos(a: String, b: String) =
      s"""(list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin
    s"""WITH centroids AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS centroid
       |  FROM embeddings WHERE vec_id < 16),
       |assign AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cos("e.embedding", "c.centroid")} DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN centroids c) WHERE rn = 1),
       |qprobe AS (
       |  SELECT query_id, q_emb, cell FROM (
       |    SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cos("e.embedding", "c.centroid")} DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN centroids c WHERE e.vec_id < 10) WHERE rn <= 4),
       |scored AS (
       |  SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id,
       |         ${cos("q.q_emb", "a.embedding")} AS cos
       |  FROM qprobe q JOIN assign a USING (cell)
       |  WHERE a.vec_id <> q.query_id)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // -------------------------------------- grouping sets (SQL surface)
  /** Runs through spark.sql text — exercising the engine's SQL entry
    * point end to end (parser → Catalyst → execution). */
  private def q49(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
  }

  private val q49Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ------------------------------------ analytic windows (lag/lead/ntile)
  private def q50(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
      .sortedOutWide("o_custkey", "o_orderkey")
  }

  private val q50Sql =
    """SELECT o_custkey, o_orderkey,
      | lag(o_orderkey) OVER w AS prev_order,
      | lead(o_orderkey) OVER w AS next_order,
      | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      | CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INTEGER) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ------------------------------------------ typed UDAF (Aggregator)
  /** Per-label embedding centroid via the VectorMeanAggregator typed
    * UDAF — partial buffers merge map-side; the shuffle carries one
    * (sums, count) buffer per (label, partition), never the vectors.
    * Double addition order varies with partitioning, so the raw value
    * can't hash against an oracle; instead (q46 pattern) the query
    * CHECKS the Aggregator against the deterministic sorted-fold
    * centroid (q35's formulation) in-plan and outputs the boolean —
    * the oracle asserts it true. The UDAF result is thereby verified
    * to 1e-6 relative without putting fp-order noise in the hash. */
  private def q51(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.VectorMeanAggregator[(Int, Array[Float])](64, _._2)
    val viaUdaf = Tables.embeddings(s, d)
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("centroid"))
      .map { case (label, c) => (label, math.sqrt(c.map(x => x * x).sum), c.length) }
      .toDF("label", "agg_norm", "dim")
    val reference = Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sort_array(collect_list(col("x").cast(DoubleType))).as("xs"),
           count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (aggregate(col("xs"), lit(0.0), (acc, v) => acc + v) / col("n")).as("mean"))
      .groupBy("label")
      .agg(sqrt(sum(col("mean") * col("mean"))).as("ref_norm"))
    viaUdaf.join(reference, Seq("label"))
      .select(col("label"), col("dim"),
        (abs(col("agg_norm") - col("ref_norm")) / col("ref_norm") <= lit(1e-6))
          .as("within_tol"))
      .sortedOut("label")
  }

  private val q51Sql =
    """SELECT label, CAST(64 AS INTEGER) AS dim, true AS within_tol
      |FROM (SELECT DISTINCT label FROM embeddings) d ORDER BY label""".stripMargin

  // ---------------------------------------- from_json map extraction
  /** JSON props parsed to a typed MAP with from_json (q20 used the
    * scalar get_json_object path), exploded and aggregated per key. */
  private def q52(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(explode(from_json(col("props"), MapType(StringType, LongType)))
        .as(Seq("key", "v")))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), min("v").as("min_v"),
           max("v").as("max_v"), sum("v").as("sum_v"))
      .sortedOut("key")

  private val q52Sql =
    """SELECT 'k' AS key, count(*) AS n,
      | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_v,
      | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_v,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_v
      |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
      |GROUP BY 1 ORDER BY key""".stripMargin

  // ------------------------------------------- interval (range) join
  /** Same-user event pairs within 5 minutes of each other (a < b):
    * bucketized equi-join, not a theta join — see
    * RelationalOps.intervalJoin. */
  private def q53(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val a = ev.select(col("user_id"), col("event_id").as("e_a"), col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("e_b"), col("ts").as("ts_b"))
    RelationalOps.intervalJoin(a, b, Seq("user_id"), "ts_a", "ts_b", 5 * 60000L)
      .where(col("e_a") < col("e_b"))
      .select(col("user_id"), col("e_a"), col("e_b"),
        (unix_millis(col("ts_b")) - unix_millis(col("ts_a"))).as("dt_ms"))
      .sortedOutWide("user_id", "e_a", "e_b")
  }

  private val q53Sql =
    """SELECT a.user_id, a.event_id AS e_a, b.event_id AS e_b,
      | epoch_ms(b.ts) - epoch_ms(a.ts) AS dt_ms
      |FROM events a JOIN events b
      |  ON b.user_id = a.user_id
      | AND a.event_id < b.event_id
      | AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 300000
      |ORDER BY a.user_id, e_a, e_b""".stripMargin

  // ----------------------------------- bounded top-k-per-key UDAF
  /** q15's top-3-orders-per-customer computed with the bounded-buffer
    * TopKAggregator instead of a ranking window — same rows, but the
    * shuffle carries ≤k entries per (key, partition) instead of every
    * order. Oracled with the row_number formulation. */
  private def q54(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.TopKAggregator[(Long, Long, Double)](
      3, r => (r._3, r._2))
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (cust, top) =>
        top.zipWithIndex.map { case ((price, ok), i) => (cust, ok, price, i + 1) }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .sortedOutWide("o_custkey", "rn")
  }

  private val q54Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ----------------------------------- mergeable distinct sketches
  /** The 100 TB distinct-count pattern: build one HLL SKETCH per
    * (day, event_type) partition — the pre-aggregate a real pipeline
    * materializes incrementally — then MERGE sketches across days per
    * type and estimate, never revisiting raw events. q46 verified the
    * scalar approx aggregate; this verifies sketch mergeability (the
    * union pass sees only 1-row-per-partition binary sketches). The
    * estimate is checked in-plan against the exact count (q46 pattern)
    * so the sketch-impl-specific value stays out of the hash. */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val daily = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sketch"))
    val merged = daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("est_users"),
           count(lit(1)).as("n_days"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("n_days"),
        (abs(col("est_users") - col("exact_users")) /
          col("exact_users") <= lit(0.15)).as("within_bounds"))
      .sortedOut("event_type")
  }

  private val q55Sql =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      | count(DISTINCT date_trunc('day', ts)) AS n_days,
      | true AS within_bounds
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ----------------------------------------------- salted skew join
  /** Revenue per part brand through RelationalOps.saltedJoin — the
    * manual skew spreader: every lineitem row gets a deterministic
    * shard from a hash of the whole row, the part dimension is
    * replicated once per shard, and the join key becomes
    * (l_partkey, shard), so a hot part key fans over `salt` reducers
    * instead of one. The result is row-for-row the plain inner join,
    * which is exactly what the oracle runs. */
  private def q64(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val p = t(s, d, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
    RelationalOps.saltedJoin(li, p, "l_partkey", salt = 8)
      .groupBy("p_brand")
      .agg(dbl(sum(d184(col("l_quantity")))).as("sum_qty"),
           count(lit(1)).as("n_lines"))
      .sortedOut("p_brand")
  }

  private val q64Sql =
    """SELECT p_brand, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      | count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ------------------------------------- stream-stream join (twin)
  /** Batch twin of EventsStream.streamStreamPairs: same-user
    * click↔view pairs within ±10 minutes, counted per user. Batch
    * runs the bucketized intervalJoin (hash-joinable key, no theta
    * nested loop); the streaming version is the watermarked
    * stream-stream join the spec pins to this result. */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val a = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("b_id"), col("ts").as("b_ts"))
    RelationalOps.intervalJoin(a, b, Seq("user_id"), "a_ts", "b_ts", 10 * 60000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
           min(col("a_id")).as("first_click"),
           max(col("b_id")).as("last_view"))
      .sortedOutWide("user_id")
  }

  private val q65Sql =
    """SELECT a.user_id, count(*) AS n_pairs,
      | min(a.event_id) AS first_click, max(b.event_id) AS last_view
      |FROM events a JOIN events b
      |  ON b.user_id = a.user_id
      | AND a.event_type = 'click' AND b.event_type = 'view'
      | AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 600000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  // ---------------------------------- built-in session_window (q67)
  /** The same 30-minute-gap sessions as q43, through Spark's native
    * `session_window` aggregation instead of the lag+running-sum
    * windows — ONE shuffle on user_id and a streaming-capable operator
    * (q43's formulation needs two window passes over a total order).
    * Semantics note: session_window closes when the next event is
    * ≥ gap away (windows are [ts, ts+gap) and merge only on overlap),
    * and the reported end is last_event + gap; the oracle derives both
    * independently via gaps-and-islands with the >= split. */
  private def q67(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
           dbl(sum(d184(col("value")))).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"), col("sum_value"))
      .sortedOutWide("user_id", "start_ms")

  private val q67Sql =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      |  FROM events),
      |y AS (
      |  SELECT *, CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms >= 1800000 THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM y)
      |SELECT user_id, min(epoch_ms(ts)) AS start_ms,
      |       max(epoch_ms(ts)) + 1800000 AS end_ms,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM z GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin

  // ---------------------------- range theta join via rewrite (q68)
  /** Written as the naive theta join — `abs(ms_a - ms_b) <= 1 min`
    * with NO equi key — and left to the RewriteRangeJoin optimizer
    * rule to bucketize (the raw plan would be an O(n²) nested loop;
    * see plans/RewriteRangeJoin). This puts the rule itself on the
    * driver's correctness path: DuckDB runs the same theta SQL its
    * own way and the pair aggregates must agree exactly. */
  private def q68(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val a = ev.select(col("event_id").as("a_id"), col("user_id").as("u_a"),
      unix_millis(col("ts")).as("ms_a"))
    val b = ev.select(col("event_id").as("b_id"), col("user_id").as("u_b"),
      unix_millis(col("ts")).as("ms_b"))
    a.join(b, abs(col("ms_a") - col("ms_b")) <= lit(60000L) &&
        col("a_id") < col("b_id"))
      .agg(count(lit(1)).as("n_pairs"),
           count(when(col("u_a") === col("u_b"), 1)).as("n_same_user"),
           max(abs(col("ms_a") - col("ms_b"))).as("max_dt_ms"))
  }

  private val q68Sql =
    """SELECT count(*) AS n_pairs,
      | count(CASE WHEN a.user_id = b.user_id THEN 1 END) AS n_same_user,
      | max(abs(epoch_ms(a.ts) - epoch_ms(b.ts))) AS max_dt_ms
      |FROM events a JOIN events b
      |  ON abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 60000
      | AND a.event_id < b.event_id""".stripMargin

  // ------------------------- whole-operator top-k strategy (q69)
  /** q54's top-3-orders-per-customer once more, through the custom
    * TopKPerKey LogicalPlan + SparkStrategy + SparkPlan: a partial
    * bounded-heap pass per input partition, ONE shuffle carrying ≤ k
    * rows per (key, partition), a final merge — the whole-operator
    * extension ladder on the driver's correctness path. Oracled with
    * the row_number formulation. */
  private def q69(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    graft.plans.TopKPerKey.topK(o, Seq("o_custkey"),
        Seq(o("o_totalprice").desc, o("o_orderkey").asc), k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .sortedOutWide("o_custkey", "o_orderkey")
  }

  private val q69Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ----------------------------------- CDC merge / upsert (q76)
  /** [[RelationalOps.mergeUpsert]] applying a deterministic synthetic
    * changelog to the orders snapshot: two update waves (the second
    * overriding the first on their overlap — last-version-wins), a
    * delete wave that also overrides updates, and an insert wave under
    * fresh keys. One max(struct) hash aggregate; no window. */
  private def q76(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    val u1 = o.where(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U1").as("o_orderstatus"),
        (col("o_totalprice") * 1.05).as("o_totalprice"),
        lit(1L).as("version"), lit("U").as("op"))
    val u2 = o.where(col("o_orderkey") % 21 === 0)
      .select(col("o_orderkey"), lit("U2").as("o_orderstatus"),
        (col("o_totalprice") * 1.10).as("o_totalprice"),
        lit(2L).as("version"), lit("U").as("op"))
    val del = o.where(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), lit(null: String).as("o_orderstatus"),
        lit(null).cast(DoubleType).as("o_totalprice"),
        lit(3L).as("version"), lit("D").as("op"))
    // insert keys offset by max(o_orderkey)+1, not a literal: a fixed
    // 10M offset collides with real orderkeys once the SF grows past
    // max(o_orderkey) >= 10M, creating (key, version) ties the two
    // engines break differently (ADVICE r3 #2). key + max + 1 > max
    // for every key >= 0 (the fixture's orderkeys start at 0), so the
    // derived offset is collision-free at any SF; the single-row max
    // aggregate broadcasts.
    val mx = o.agg((max(col("o_orderkey")) + 1L).as("__off"))
    val ins = o.where(col("o_orderkey") % 11 === 0).crossJoin(mx)
      .select((col("o_orderkey") + col("__off")).as("o_orderkey"),
        lit("NEW").as("o_orderstatus"), col("o_totalprice"),
        lit(1L).as("version"), lit("U").as("op"))
    RelationalOps.mergeUpsert(o, u1.unionByName(u2).unionByName(del).unionByName(ins),
        "o_orderkey", "version", "op")
      .sortedOutWide("o_orderkey")
  }

  private val q76Sql =
    """WITH chg AS (
      |  SELECT o_orderkey AS k, 0 AS v, 'U' AS op, o_orderstatus AS st, o_totalprice AS pr FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 1, 'U', 'U1', o_totalprice * CAST(1.05 AS DOUBLE) FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 2, 'U', 'U2', o_totalprice * CAST(1.10 AS DOUBLE) FROM orders WHERE o_orderkey % 21 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 3, 'D', NULL, NULL FROM orders WHERE o_orderkey % 13 = 0
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders), 1, 'U', 'NEW', o_totalprice FROM orders WHERE o_orderkey % 11 = 0),
      |w AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn FROM chg)
      |SELECT k AS o_orderkey, st AS o_orderstatus, pr AS o_totalprice
      |FROM w WHERE rn = 1 AND op != 'D'
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------- sliding event windows (q77)
  /** Sliding (hopping) 30-minute windows every 10 minutes over the
    * events stream — the overlapping-window twin of q21's tumbling
    * hour. Spark's `window(ts, size, slide)` expands each event into
    * size/slide = 3 rows BEFORE the aggregate (a narrow generate, no
    * extra shuffle); the oracle mirrors that expansion with an
    * explicit 3-offset unnest. Same transform lifts to readStream +
    * watermark unchanged (SURVEY §2.10). */
  private def q77(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(sum(d184(col("value")))).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .sortedOutWide("win_start", "event_type")

  private val q77Sql =
    """SELECT strftime(make_timestamp(((CAST(floor(epoch(ts) / 600) AS BIGINT) - k) * 600) * 1000000),
      |         '%Y-%m-%d %H:%M:%S') AS win_start,
      | event_type, count(*) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------- full outer join (q80)
  /** The one join category the inventory lacked: FULL OUTER between a
    * customer segment and per-customer big-order counts — unmatched
    * rows survive from BOTH sides, with null-flags and coalesced keys
    * mirroring the reference's membership-flag idiom (J5). */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val o = t(s, d, "orders").where(col("o_totalprice") > 475000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_big"), lit(0L)).as("n_big_orders"),
        (col("c_custkey").isNotNull && col("o_custkey").isNull).as("building_only"),
        col("c_custkey").isNull.as("orders_only"))
      .sortedOutWide("custkey")
  }

  private val q80Sql =
    """SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name,
      | coalesce(n_big, 0) AS n_big_orders,
      | (c_custkey IS NOT NULL AND o_custkey IS NULL) AS building_only,
      | c_custkey IS NULL AS orders_only
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
      |FULL JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
      |           WHERE o_totalprice > 475000 GROUP BY o_custkey) o
      |  ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  // ------------------------------------- skew diagnostics (q82)
  /** [[graft.ops.Diagnostics.skewReport]] over the events user stream —
    * the pre-join skew check whose ratio is the saltedJoin (q64)
    * replication factor. */
  private def q82(s: SparkSession, d: String): DataFrame =
    graft.ops.Diagnostics.skewReport(Tables.events(s, d), "user_id")

  private val q82Sql =
    """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
      |SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS max_n,
      | (SELECT user_id FROM c ORDER BY n DESC, user_id DESC LIMIT 1) AS hot_key,
      | CAST(max(n) AS DOUBLE) * count(*) / sum(n) AS skew_ratio
      |FROM c""".stripMargin

  // ----------------------- approx-percentile contract (q83)
  /** approx_percentile against the exact percentile, q46-pattern: the
    * sketch value stays out of the hash; the booleans assert it lies
    * between the exact percentiles at p ± 2/accuracy (double the
    * documented 1/accuracy rank-error bound). Exact percentiles ride
    * the q41 DECIMAL(18,6) rounding, which absorbs interpolation
    * ulps.
    *
    * SCALE CAVEAT: the exact `percentile` references buffer the whole
    * column in ONE global aggregation buffer — contract twin only, NOT
    * a production path; at 100 TB a pipeline keeps only the
    * `approx_percentile` side (mergeable sketch, constant memory).
    * The nine percentile evaluations below share one aggregate pass,
    * but each is its own full-column buffer. */
  private def q83(s: SparkSession, d: String): DataFrame = {
    val acc = 1000
    val eps = 2.0 / acc
    // ONE exact-percentile buffer (array percentage) serves all nine
    // points, and ONE approx sketch serves the three probes — the
    // separate-call form built 9 full-column buffers + 3 sketches and
    // cost 3.2 s at sf0.1 for identical values (interpolation happens
    // per element from the same sorted buffer)
    val ps = Seq(0.5 - eps, 0.5, 0.5 + eps, 0.9 - eps, 0.9, 0.9 + eps,
      0.99 - eps, 0.99, 0.99 + eps)
    val agg = t(s, d, "orders").agg(
      percentile(col("o_totalprice"), typedLit(ps)).as("__pct"),
      expr(s"approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), $acc)").as("__apx"),
      count(lit(1)).as("n"))
    def pct(i: Int) = element_at(col("__pct"), i + 1)
    def apx(i: Int) = element_at(col("__apx"), i + 1)
    def exOut(i: Int) = pct(i).cast(DecimalType(18, 6)).cast(DoubleType)
    agg.select(
      exOut(1).as("p50_exact"), exOut(4).as("p90_exact"), exOut(7).as("p99_exact"),
      apx(0).between(pct(0), pct(2)).as("p50_ok"),
      apx(1).between(pct(3), pct(5)).as("p90_ok"),
      apx(2).between(pct(6), pct(8)).as("p99_ok"),
      col("n"))
  }

  private val q83Sql =
    """SELECT
      | CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS p50_exact,
      | CAST(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90_exact,
      | CAST(CAST(quantile_cont(o_totalprice, 0.99) AS DECIMAL(18,6)) AS DOUBLE) AS p99_exact,
      | true AS p50_ok, true AS p90_ok, true AS p99_ok,
      | count(*) AS n
      |FROM orders""".stripMargin

  // ----------------------------- standing vector index probe (q85)
  /** q47's IVF search served from the STANDING [[graft.sim.VectorIndex]]
    * — the corpus is materialized cell-partitioned on disk, the probe
    * join prunes cells via dynamic partition pruning (VectorIndexSpec
    * pins the dynamicpruning plan shape), and the top-k must equal the
    * in-plan q47 result row for row, so it shares q47's oracle SQL.
    * The write lands under target/ (driver-local scratch); each run
    * rebuilds it, which is the honest cost of the serving shape. */
  private def q85(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val ivf = new IvfIndex(nCells = 16, nProbe = 4)
    val dir = s"target/indexes/vec_${new java.io.File(d).getName}"
    graft.sim.VectorIndex.write(e, dir, ivf, ivf.centroidsOf(e))
    graft.sim.VectorIndex.topK(s, dir, e.where(col("vec_id") < 10), k = 5, ivf)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .sortedOut("query_id", "rank")
  }

  // ------------------------------- data-profiling report (q91)
  /** [[graft.ops.Diagnostics.profile]] over four orders columns of
    * mixed types — row/null/exact-distinct counts and min/max rendered
    * as strings, all in ONE aggregate pass (doubles excluded from the
    * profile: their string rendering is engine-specific, the q46
    * cross-engine discipline). */
  private def q91(s: SparkSession, d: String): DataFrame =
    graft.ops.Diagnostics.profile(t(s, d, "orders"),
        Seq("o_orderstatus", "o_custkey", "o_orderpriority", "o_orderdate"))
      .sortedOut("column")

  private val q91Sql = {
    def one(c: String) =
      s"""SELECT '$c' AS "column",
         |  (SELECT count(*) FROM orders) AS n_rows,
         |  (SELECT count(*) FROM orders) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    Seq("o_orderstatus", "o_custkey", "o_orderpriority", "o_orderdate")
      .map(one).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
  }

  // ------------------- left-outer stream-stream join, batch twin (q96)
  /** Funnel-drop analysis — clicks paired with same-user views within
    * ±10 min, KEEPING the clicks that never converted (the rows an
    * inner join can't express). Runs the streaming operator
    * [[graft.streaming.EventsStream.streamStreamPairsLeftOuter]]
    * itself in batch mode (watermarks are no-ops on bounded input), so
    * the oracled result pins the exact code path the stream executes;
    * the spec pins the streaming run — incl. that unmatched rows emit
    * only on watermark advance — to this same join.
    *
    * Scale shape: one shuffle on user_id for both sides; per-user
    * match windows are minutes wide, so state (streaming) or the
    * per-key join group (batch) stays bounded. */
  private def q96(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventsStream.streamStreamPairsLeftOuter(Tables.events(s, d))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
           count(col("b_id")).as("n_matched"),
           (count(lit(1)) - count(col("b_id"))).as("n_unmatched"),
           min(col("dt_ms")).as("min_dt_ms"),
           max(col("dt_ms")).as("max_dt_ms"))
      .sortedOutWide("user_id")

  private val q96Sql =
    """SELECT user_id, count(*) AS n_rows, count(b_id) AS n_matched,
      | count(*) - count(b_id) AS n_unmatched,
      | min(dt_ms) AS min_dt_ms, max(dt_ms) AS max_dt_ms
      |FROM (
      |  SELECT a.user_id, b.event_id AS b_id,
      |         epoch_ms(b.ts) - epoch_ms(a.ts) AS dt_ms
      |  FROM (SELECT * FROM events WHERE event_type = 'click') a
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
      |    ON b.user_id = a.user_id
      |   AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 600000)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------- z-order curve statistics (q98)
  /** Pins [[graft.ops.Maintenance.zValue2]]'s bit-interleave exactly
    * across engines: 8-bit z-values of (l_partkey, l_suppkey) folded
    * mod 256, bucketed by the z prefix, with per-bucket key envelopes
    * — the min/max spans that row-group skipping prunes on after a
    * [[graft.ops.Maintenance.writeZOrdered]] layout. The actual
    * skipping benefit is metric-proven in ScaleOpsSpec (DuckDB can't
    * oracle parquet row-group IO); this query oracles the curve
    * arithmetic the layout sorts by. Narrow projection + one integer
    * aggregation. */
  private def q98(s: SparkSession, d: String): DataFrame = {
    val z = graft.ops.Maintenance.zValue2(
      pmod(col("l_partkey"), lit(256L)), pmod(col("l_suppkey"), lit(256L)), bits = 8)
    t(s, d, "lineitem")
      .select(z.as("z"), col("l_partkey"), col("l_suppkey"))
      .groupBy(shiftright(col("z"), 8).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
           min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .sortedOut("z_bucket")
  }

  private val q98Sql = {
    val zExpr = (0 until 8)
      .map(i => s"(((a & ${1L << i}) << $i) | ((b & ${1L << i}) << ${i + 1}))")
      .mkString(" | ")
    s"""WITH kb AS (
       |  SELECT l_partkey % 256 AS a, l_suppkey % 256 AS b, l_partkey, l_suppkey
       |  FROM lineitem),
       |z AS (SELECT ($zExpr) AS z, l_partkey, l_suppkey FROM kb)
       |SELECT z >> 8 AS z_bucket, count(*) AS n,
       |       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
  }


  // --------------------- layout skipping census: z vs sort vs hash (q189)
  /** The AUDIT step after a [[graft.ops.Maintenance.writeZOrdered]]
    * layout decision: how many files (and rows) would min/max pruning
    * actually read under each of the three canonical layouts — z-order
    * ([[graft.ops.ZOrder.zvalue]], the native Morton expression),
    * single-column sort, and key-hash — for a point predicate on
    * either dimension and a box on both. Real parquet row-group IO
    * can't be oracled cross-engine (ScaleOpsSpec metric-proves it);
    * this census SIMULATES the pruning with pure integer math both
    * engines reproduce bit-for-bit: rows fold to 8-bit (a, b) coords,
    * each layout assigns a file id (z>>10, a>>2, (31a+b)%64 — 64
    * "files" each), per-file envelopes are (min,max) per dimension,
    * and a file is READ iff its envelope intersects the predicate —
    * exactly the parquet footer-stats rule.
    *
    * The expected shape IS the z-order story: sort-by-a prunes a-point
    * predicates perfectly and b-points not at all; hash prunes
    * nothing; z-order prunes BOTH to ~sqrt-ish file subsets and boxes
    * hardest. ONE narrow scan of two int columns (at 100 TB the scan
    * IS the cost — a per-layout pass would read the table three
    * times): each row explodes to its three (layout, file)
    * assignments, the envelope aggregate map-side-combines to ≤
    * 3·64 groups, and the census is a second 192-row aggregate.
    * Output is 3 rows.
    */
  private def q189(s: SparkSession, d: String): DataFrame = {
    val coords = t(s, d, "lineitem")
      .select(pmod(col("l_partkey"), lit(256)).cast("int").as("a"),
              pmod(col("l_suppkey"), lit(256)).cast("int").as("b"))
    val envelopes = coords
      .select(col("a"), col("b"), explode(array(
        struct(lit("hash").as("layout"),
          pmod(col("a") * 31 + col("b"), lit(64)).cast("long").as("file")),
        struct(lit("sort_a").as("layout"),
          shiftright(col("a"), 2).cast("long").as("file")),
        struct(lit("zorder").as("layout"),
          shiftright(graft.ops.ZOrder.zvalue(col("a"), col("b"), bits = 8), 10)
            .as("file")))).as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file").as("file"))
      .agg(count(lit(1)).as("n"),
           min("a").as("lo_a"), max("a").as("hi_a"),
           min("b").as("lo_b"), max("b").as("hi_b"))
    envelopes
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"),
        sum(when(col("lo_a") <= 42 && col("hi_a") >= 42, 1L).otherwise(0L)).as("files_pa"),
        sum(when(col("lo_a") <= 42 && col("hi_a") >= 42, col("n")).otherwise(0L)).as("rows_pa"),
        sum(when(col("lo_b") <= 7 && col("hi_b") >= 7, 1L).otherwise(0L)).as("files_pb"),
        sum(when(col("lo_b") <= 7 && col("hi_b") >= 7, col("n")).otherwise(0L)).as("rows_pb"),
        sum(when(col("lo_a") <= 47 && col("hi_a") >= 40 &&
                 col("lo_b") <= 15 && col("hi_b") >= 0, 1L).otherwise(0L)).as("files_box"),
        sum(when(col("lo_a") <= 47 && col("hi_a") >= 40 &&
                 col("lo_b") <= 15 && col("hi_b") >= 0, col("n")).otherwise(0L)).as("rows_box"))
      .select(col("layout"), col("n_files"), col("n_rows"),
        col("files_pa"), col("rows_pa"), col("files_pb"), col("rows_pb"),
        col("files_box"), col("rows_box"))
      .sortedOut("layout")
  }

  private val q189Sql = {
    val zExpr = (0 until 8)
      .map(i => s"(((a & ${1L << i}) << $i) | ((b & ${1L << i}) << ${i + 1}))")
      .mkString(" | ")
    def census(layout: String, fileExpr: String) =
      s"""SELECT '$layout' AS layout,
         |  CAST(count(*) AS BIGINT) AS n_files, CAST(sum(n) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN lo_a <= 42 AND hi_a >= 42 THEN 1 ELSE 0 END) AS BIGINT) AS files_pa,
         |  CAST(sum(CASE WHEN lo_a <= 42 AND hi_a >= 42 THEN n ELSE 0 END) AS BIGINT) AS rows_pa,
         |  CAST(sum(CASE WHEN lo_b <= 7 AND hi_b >= 7 THEN 1 ELSE 0 END) AS BIGINT) AS files_pb,
         |  CAST(sum(CASE WHEN lo_b <= 7 AND hi_b >= 7 THEN n ELSE 0 END) AS BIGINT) AS rows_pb,
         |  CAST(sum(CASE WHEN lo_a <= 47 AND hi_a >= 40 AND lo_b <= 15 AND hi_b >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS files_box,
         |  CAST(sum(CASE WHEN lo_a <= 47 AND hi_a >= 40 AND lo_b <= 15 AND hi_b >= 0 THEN n ELSE 0 END) AS BIGINT) AS rows_box
         |FROM (SELECT $fileExpr AS file, CAST(count(*) AS BIGINT) AS n,
         |        min(a) AS lo_a, max(a) AS hi_a, min(b) AS lo_b, max(b) AS hi_b
         |      FROM coords GROUP BY 1) env""".stripMargin
    s"""WITH kb AS (SELECT l_partkey % 256 AS a, l_suppkey % 256 AS b FROM lineitem),
       |coords AS (SELECT a, b, ($zExpr) AS z FROM kb)
       |SELECT * FROM (
       |${census("hash", "(a * 31 + b) % 64")}
       |UNION ALL
       |${census("sort_a", "a // 4")}
       |UNION ALL
       |${census("zorder", "z // 1024")}
       |) u ORDER BY layout""".stripMargin
  }


  // --------------------- k-anonymity / pseudonymization audit (q194)
  /** The privacy-risk audit a dataset release runs after redaction
    * (q73): pseudonymize the direct identifier (md5-60 of c_custkey —
    * deterministic, join-preserving, the engine-wide hash both engines
    * replay), group by the QUASI-identifier tuple (nation, market
    * segment, account-balance kilobucket), and report the k-anonymity
    * histogram — how many equivalence classes (and member records)
    * fall in each size band. Records in small classes (k < 5) are the
    * re-identification surface a release either suppresses or
    * generalizes; the per-band pseudonym count doubling as an
    * injectivity check (classes partition records, so the band sums
    * of per-class distinct pseudonyms must equal the member counts).
    * The balance bucket is floor(x/1000) on the SAME IEEE double both
    * engines read from parquet — division and floor are deterministic,
    * so the bucketing cannot drift.
    *
    * Scale shape: one hash-aggregate on the quasi-tuple (map-side
    * combining), one |classes|-bounded re-aggregate; no row-level
    * data leaves the first shuffle. */
  private def q194(s: SparkSession, d: String): DataFrame = {
    val classes = t(s, d, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_kb"),
        graft.text.Hashing.h60(col("c_custkey")).as("pseudo"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_kb")
      .agg(count(lit(1)).as("n"), countDistinct(col("pseudo")).as("np"))
    classes
      .select(
        when(col("n") === 1, "k1_unique")
          .when(col("n") <= 4, "k2_4")
          .when(col("n") <= 9, "k5_9")
          .otherwise("k10_plus").as("band"),
        col("n"), col("np"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_records"),
        sum(col("np")).as("n_pseudonyms"))
      .sortedOut("band")
  }

  private val q194Sql =
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)) AS BIGINT) AS np
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT CASE WHEN n = 1 THEN 'k1_unique'
      |            WHEN n <= 4 THEN 'k2_4'
      |            WHEN n <= 9 THEN 'k5_9'
      |            ELSE 'k10_plus' END AS band,
      |  CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(sum(n) AS BIGINT) AS n_records,
      |  CAST(sum(np) AS BIGINT) AS n_pseudonyms
      |FROM cls GROUP BY 1 ORDER BY band""".stripMargin


  // --------------------- rendezvous sharding rebalance census (q197)
  /** Consistent shard assignment by rendezvous (highest-random-weight)
    * hashing — the layout policy that lets an INCREMENTAL corpus grow
    * its shard count without reshuffling everything: each key goes to
    * the shard with the highest h(shard, key), so adding shard N+1
    * only steals the keys whose new hash wins — an expected 1/(N+1)
    * of the corpus — while every other assignment stays put (mod-N
    * hashing would move (N-1)/N of all keys). The census assigns every
    * document at N=8 and N=9 over the engine-wide seeded md5-60 and
    * reports, per shard: size before, size after, arrivals and
    * departures. Both engines compute the identical argmax (hash
    * desc, shard asc tie-break), so balance AND stability are
    * exact-matched, not estimated.
    *
    * Scale shape: one narrow explode (9 rows per key) + two
    * shard-bounded aggregates; nothing but 9 rows reaches the sort. */
  private def q197(s: SparkSession, d: String): DataFrame = {
    val assigned = Tables.documents(s, d).select(col("doc_id"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(8))).as("shard"))
      .select(col("doc_id"), col("shard"),
        graft.text.Hashing.h60(concat(col("shard").cast("string"), lit(":"),
          col("doc_id").cast("string"))).as("w"))
      .groupBy("doc_id")
      // ordering key w·16 − shard is strictly unique across the 9
      // candidates (shards differ), so the argmax is deterministic on
      // both engines without relying on never-observed hash ties
      .agg(
        max_by(col("shard"), when(col("shard") < 8,
          col("w").cast(DecimalType(38, 0)) * 16 - col("shard"))).as("s8"),
        max_by(col("shard"),
          col("w").cast(DecimalType(38, 0)) * 16 - col("shard")).as("s9"))
      .select(col("doc_id"), col("s8"), col("s9"))
    assigned
      .select(explode(array(
        struct(col("s8").as("shard"), lit(1L).as("at8"), lit(0L).as("at9"),
          when(col("s8") =!= col("s9"), 1L).otherwise(0L).as("departed"),
          lit(0L).as("arrived")),
        struct(col("s9").as("shard"), lit(0L).as("at8"), lit(1L).as("at9"),
          lit(0L).as("departed"),
          when(col("s8") =!= col("s9"), 1L).otherwise(0L).as("arrived")))).as("r"))
      .groupBy(col("r.shard").cast("long").as("shard"))
      .agg(sum(col("r.at8")).as("n_at_8"), sum(col("r.at9")).as("n_at_9"),
        sum(col("r.departed")).as("n_departed"), sum(col("r.arrived")).as("n_arrived"))
      .sortedOut("shard")
  }

  private val q197Sql =
    """WITH w AS (SELECT doc_id, shard,
      |    CAST(concat('0x', substr(md5(CAST(shard AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS w
      |  FROM documents, unnest(range(0, 9)) AS t(shard)),
      |a AS (SELECT doc_id,
      |    arg_max(shard, CAST(w AS HUGEINT) * 16 - shard) FILTER (shard < 8) AS s8,
      |    arg_max(shard, CAST(w AS HUGEINT) * 16 - shard) AS s9
      |  FROM w GROUP BY doc_id),
      |sides AS (
      |  SELECT s8 AS shard, 1 AS at8, 0 AS at9,
      |    CASE WHEN s8 <> s9 THEN 1 ELSE 0 END AS departed, 0 AS arrived FROM a
      |  UNION ALL
      |  SELECT s9, 0, 1, 0, CASE WHEN s8 <> s9 THEN 1 ELSE 0 END FROM a)
      |SELECT CAST(shard AS BIGINT) AS shard,
      |  CAST(sum(at8) AS BIGINT) AS n_at_8, CAST(sum(at9) AS BIGINT) AS n_at_9,
      |  CAST(sum(departed) AS BIGINT) AS n_departed,
      |  CAST(sum(arrived) AS BIGINT) AS n_arrived
      |FROM sides GROUP BY shard ORDER BY shard""".stripMargin

  // --------------------- ANALYZE-style column statistics census (q198)
  /** The stats-collection pass a cost-based optimizer runs (`ANALYZE
    * TABLE ... COMPUTE STATISTICS FOR COLUMNS`): per-column row count,
    * null count, exact NDV, min/max — plus an equi-depth (equi-height)
    * histogram over `o_totalprice`, the structure join-selectivity and
    * range-predicate estimates actually consume. Two row families in
    * one output: `col:<name>` rows carry the per-column scalars
    * (numeric min/max as doubles, string min/max in their own columns
    * — binary/UTF-8 collation on both engines; timestamps exported as
    * epoch millis), `hist:o_totalprice:<k>` rows carry the 8-bucket
    * boundaries (bucket max IS the boundary), per-bucket row count and
    * NDV. The HLL arm is verified IN-PLAN, not exported: each engine
    * asserts its own `approx_count_distinct` lands within 15% of the
    * exact NDV (`hll_ok` — Spark HLL++ at default 5% rsd vs DuckDB's
    * own sketch; the q46 exact-vs-sketch split), because sketch
    * estimates themselves are implementation-defined and can never
    * hash-match.
    *
    * Scale shape: the scalar family is ONE map-side-combinable
    * aggregate over a single scan (1 row → 6 exploded). The histogram
    * family needs a total order (ntile over `(price, orderkey)` — the
    * tiebreak makes bucket CONTENTS deterministic, not just
    * boundaries); at 100 TB the boundaries come from
    * `approx_percentile` or a range-partitioner sample instead — this
    * exact ntile form is the verification twin, the q41 precedent. NDV
    * per column is the exact arm; the production arm at scale is the
    * in-plan-verified HLL. */
  private def q198(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    // Melt shape, not one wide multi-DISTINCT aggregate: six exact
    // countDistinct + six HLL sketches in a single agg plan as
    // Expand → cascaded SortAggregates (three full sorts of the
    // 7×-expanded scan — measured 7.2 s at sf0.1). Melting to
    // (column, value) rows keeps every stage a map-side-combinable
    // HASH aggregate: one shuffle carries only the distinct
    // (column, value) pairs, and NDV/null/min/max/HLL all fold from
    // that pre-distinct frame (HLL is duplicate-insensitive, so the
    // sketch over distinct values estimates the same cardinality).
    val nullD = lit(null: java.lang.Double)
    val nullS = lit(null: String)
    val melted = o.select(explode(array(
        struct(lit("col:o_orderkey").as("stat_key"),
          col("o_orderkey").cast(DoubleType).as("nv"), nullS.as("sv")),
        struct(lit("col:o_custkey").as("stat_key"),
          col("o_custkey").cast(DoubleType).as("nv"), nullS.as("sv")),
        struct(lit("col:o_totalprice").as("stat_key"),
          col("o_totalprice").as("nv"), nullS.as("sv")),
        // orders' o_orderdate parquet is NTZ-annotated; session tz is
        // pinned UTC, so casting to TIMESTAMP preserves the instant
        struct(lit("col:o_orderdate").as("stat_key"),
          unix_millis(col("o_orderdate").cast(TimestampType)).cast(DoubleType).as("nv"),
          nullS.as("sv")),
        struct(lit("col:o_orderstatus").as("stat_key"),
          nullD.as("nv"), col("o_orderstatus").as("sv")),
        struct(lit("col:o_orderpriority").as("stat_key"),
          nullD.as("nv"), col("o_orderpriority").as("sv")))).as("r"))
      .select(col("r.stat_key"), col("r.nv"), col("r.sv"))
    val perValue = melted.groupBy("stat_key", "nv", "sv")
      .agg(count(lit(1)).as("cnt"))
    val scalars = perValue.groupBy("stat_key")
      .agg(
        sum(col("cnt")).as("n"),
        coalesce(sum(when(col("nv").isNull && col("sv").isNull, col("cnt"))),
          lit(0L)).as("n_null"),
        sum(when(col("nv").isNotNull || col("sv").isNotNull, 1L)
          .otherwise(0L)).as("ndv"),
        approx_count_distinct(coalesce(col("nv").cast(StringType), col("sv")))
          .as("hll"),
        min(col("nv")).as("min_num"), max(col("nv")).as("max_num"),
        min(col("sv")).as("min_str"), max(col("sv")).as("max_str"))
      .select(col("stat_key"), col("n"), col("n_null"), col("ndv"),
        (abs(col("hll") - col("ndv")) * 100 <= col("ndv") * 15).as("hll_ok"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    // Equi-depth histogram WITHOUT the single-partition cliff: the
    // previous `ntile(8).over(Window.orderBy(...))` form sank the whole
    // orders table through one task. globalRowNumber range-partitions +
    // locally sorts (every partition ranks in parallel); the ntile
    // bucket is then closed-form arithmetic on (rn, n): Spark's ntile
    // gives the first (n mod 8) buckets ceil(n/8) rows and the rest
    // floor(n/8) — reproduced exactly below, so the oracle hash is
    // unchanged. n arrives as a 1-row broadcast (totals-join idiom).
    val ranked = RelationalOps.globalRowNumber(
      o.select(col("o_totalprice"), col("o_orderkey")),
      Seq(col("o_totalprice").asc, col("o_orderkey").asc))
    val nTotal = ranked.agg(count(lit(1)).as("n_total"))
    val qSize = floor(col("n_total") / 8)
    val rExtra = col("n_total") % 8
    val cutoff = rExtra * (qSize + 1)
    val bucketExpr = when(col("rn") <= cutoff,
        floor((col("rn") - 1) / (qSize + 1)) + 1)
      .otherwise(rExtra + floor((col("rn") - cutoff - 1) / greatest(qSize, lit(1L))) + 1)
    val hist = ranked.crossJoin(broadcast(nTotal))
      .withColumn("bucket", bucketExpr.cast(IntegerType))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), countDistinct(col("o_totalprice")).as("ndv"),
        min(col("o_totalprice")).as("min_num"), max(col("o_totalprice")).as("max_num"))
      .select(concat(lit("hist:o_totalprice:"), col("bucket").cast("string")).as("stat_key"),
        col("n"), lit(null: java.lang.Long).as("n_null"), col("ndv"),
        lit(null: java.lang.Boolean).as("hll_ok"), col("min_num"), col("max_num"),
        lit(null: String).as("min_str"), lit(null: String).as("max_str"))
    scalars.unionByName(hist).sortedOut("stat_key")
  }

  private val q198Sql =
    """WITH s AS (SELECT
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z1,
      |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d1,
      |  abs(approx_count_distinct(o_orderkey) - count(DISTINCT o_orderkey)) * 100 <= count(DISTINCT o_orderkey) * 15 AS h1,
      |  CAST(min(o_orderkey) AS DOUBLE) AS lo1, CAST(max(o_orderkey) AS DOUBLE) AS hi1,
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z2,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS d2,
      |  abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey)) * 100 <= count(DISTINCT o_custkey) * 15 AS h2,
      |  CAST(min(o_custkey) AS DOUBLE) AS lo2, CAST(max(o_custkey) AS DOUBLE) AS hi2,
      |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z3,
      |  CAST(count(DISTINCT o_totalprice) AS BIGINT) AS d3,
      |  abs(approx_count_distinct(o_totalprice) - count(DISTINCT o_totalprice)) * 100 <= count(DISTINCT o_totalprice) * 15 AS h3,
      |  min(o_totalprice) AS lo3, max(o_totalprice) AS hi3,
      |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z4,
      |  CAST(count(DISTINCT o_orderdate) AS BIGINT) AS d4,
      |  abs(approx_count_distinct(o_orderdate) - count(DISTINCT o_orderdate)) * 100 <= count(DISTINCT o_orderdate) * 15 AS h4,
      |  CAST(epoch_ms(min(o_orderdate)) AS DOUBLE) AS lo4,
      |  CAST(epoch_ms(max(o_orderdate)) AS DOUBLE) AS hi4,
      |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z5,
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS d5,
      |  abs(approx_count_distinct(o_orderstatus) - count(DISTINCT o_orderstatus)) * 100 <= count(DISTINCT o_orderstatus) * 15 AS h5,
      |  min(o_orderstatus) AS slo5, max(o_orderstatus) AS shi5,
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z6,
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS d6,
      |  abs(approx_count_distinct(o_orderpriority) - count(DISTINCT o_orderpriority)) * 100 <= count(DISTINCT o_orderpriority) * 15 AS h6,
      |  min(o_orderpriority) AS slo6, max(o_orderpriority) AS shi6
      |  FROM orders),
      |cols AS (
      |  SELECT 'col:o_orderkey' AS stat_key, n, z1 AS n_null, d1 AS ndv, h1 AS hll_ok,
      |    lo1 AS min_num, hi1 AS max_num, NULL AS min_str, NULL AS max_str FROM s
      |  UNION ALL SELECT 'col:o_custkey', n, z2, d2, h2, lo2, hi2, NULL, NULL FROM s
      |  UNION ALL SELECT 'col:o_totalprice', n, z3, d3, h3, lo3, hi3, NULL, NULL FROM s
      |  UNION ALL SELECT 'col:o_orderdate', n, z4, d4, h4, lo4, hi4, NULL, NULL FROM s
      |  UNION ALL SELECT 'col:o_orderstatus', n, z5, d5, h5, NULL, NULL, slo5, shi5 FROM s
      |  UNION ALL SELECT 'col:o_orderpriority', n, z6, d6, h6, NULL, NULL, slo6, shi6 FROM s),
      |hist AS (
      |  SELECT concat('hist:o_totalprice:', CAST(bucket AS VARCHAR)) AS stat_key,
      |    CAST(count(*) AS BIGINT) AS n, NULL AS n_null,
      |    CAST(count(DISTINCT o_totalprice) AS BIGINT) AS ndv, NULL AS hll_ok,
      |    min(o_totalprice) AS min_num, max(o_totalprice) AS max_num,
      |    NULL AS min_str, NULL AS max_str
      |  FROM (SELECT o_totalprice,
      |          ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      |        FROM orders)
      |  GROUP BY 1)
      |SELECT * FROM cols UNION ALL SELECT * FROM hist ORDER BY stat_key""".stripMargin

  // --------- weighted sampling without replacement / PPSWOR (q199)
  /** Priority sampling (Duffield–Lund–Thorup): every document gets a
    * deterministic pseudo-random priority `w·2⁴⁰ div (u+1)` — weight
    * `n_chars` over a uniform 40-bit draw `u = h60(doc_id) div 2²⁰`
    * from the engine-wide seeded md5-60 — and the sample is the top-k
    * priorities PER STRATUM (lang). Unlike the Bernoulli designs
    * (q127 temperature, q173 distribution-match) the sample size is
    * EXACT, not expected, and weight-proportional inclusion comes from
    * the priority order itself. All arithmetic is integral (LONG:
    * `w ≤ 2²⁰`, so `w·2⁴⁰ < 2⁶³`; both engines' integer division
    * floors non-negatives identically), the order is totalized by a
    * doc_id tiebreak, so the SELECTED SET — not a distributional
    * property of it — exact-matches. Census per lang: k check, total
    * vs selected weight mass, the (k+1)-exclusive threshold proxy
    * `min_prio`, and id checksums pinning membership.
    *
    * Scale shape: priorities are a narrow per-row projection; the
    * top-k per stratum runs on the native [[TopKPerKey]] plan — a
    * partial per-partition heap before the shuffle, so only
    * `|strata|·k` rows ever cross the exchange (the q69 operator, not
    * a row_number window that sorts whole partitions). */
  private def q199(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        shiftright(graft.text.Hashing.h60(col("doc_id")), 20).as("u40"))
      .withColumn("prio",
        expr("CAST(n_chars AS BIGINT) * 1099511627776 div (u40 + 1)"))
    val sel = graft.plans.TopKPerKey.topK(docs, Seq("lang"),
      Seq(col("prio").desc, col("doc_id").asc), 50)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_chars")).as("w_selected"),
        min(col("prio")).as("min_prio"),
        sum(col("doc_id")).as("id_sum"),
        sum(col("doc_id") * col("doc_id")).as("id_sq_sum"))
    val tot = Tables.documents(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_total"), sum(col("n_chars")).as("w_total"))
    sel.join(tot, Seq("lang")).sortedOut("lang")
  }

  private val q199Sql =
    """WITH p AS (SELECT doc_id, lang, n_chars,
      |    CAST(n_chars AS BIGINT) * 1099511627776 //
      |      (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) // 1048576 + 1) AS prio
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY prio DESC, doc_id ASC) AS rn FROM p),
      |sel AS (SELECT lang,
      |    CAST(count(*) AS BIGINT) AS n_selected,
      |    CAST(sum(n_chars) AS BIGINT) AS w_selected,
      |    CAST(min(prio) AS BIGINT) AS min_prio,
      |    CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |    CAST(sum(doc_id * doc_id) AS BIGINT) AS id_sq_sum
      |  FROM r WHERE rn <= 50 GROUP BY lang),
      |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
      |    CAST(sum(n_chars) AS BIGINT) AS w_total
      |  FROM documents GROUP BY lang)
      |SELECT sel.*, tot.n_total, tot.w_total FROM sel JOIN tot USING (lang)
      |ORDER BY lang""".stripMargin

  // ------------- sliding-window outlier census, integer-exact (q200)
  /** Per-entity streaming-style anomaly flags: each order is scored
    * against its customer's TRAILING window (the 5 previous orders by
    * `(o_orderdate, o_orderkey)` — strictly before, so the point never
    * whitens its own baseline — though an outlier ALREADY INSIDE the
    * trailing window inflates σ and can mask the next few points:
    * baseline contamination is the documented trade of trailing-window
    * scoring, pinned by AdvSweep wave 8's contaminated-dip case; the
    * robust alternative at scale is a median/MAD window, which has no
    * integer-exact form). The z-score test `|x−μ| > 3σ` is kept
    * INTEGER end-to-end by clearing denominators: with n, S=Σxᵢ,
    * Q=Σxᵢ² over the window in CENTS, flag iff
    * `(n·x−S)² > 9·(n·Q−S²)` — exactly `(x−μ)² > 9σ²·n²/n²` scaled by
    * n², no division, no sqrt, no fp anywhere (LONG-safe:
    * cents ≤ 5·10⁷, so `n·x ≤ 2.5·10⁸` and every square
    * `≤ 6.25·10¹⁶ ≪ 2⁶³`). Windows need ≥3 points and nonzero
    * variance (a constant window flags any deviation). Census per
    * order-year: evaluated/flagged counts, flagged cents mass, and an
    * orderkey checksum pinning WHICH orders flagged.
    *
    * Scale shape: one customer-keyed shuffle; the window state is a
    * bounded 5-row frame (Spark's sliding-frame aggregation keeps
    * running sums, not the partition); the year rollup is
    * map-side-combinable on top. The cents quantization
    * `round(x·100)` is the same IEEE double op in both engines. */
  private def q200(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-5, -1)
    val scored = t(s, d, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("ws", sum(col("cents")).over(w))
      .withColumn("wq", sum(col("cents") * col("cents")).over(w))
      .withColumn("dev", col("wn") * col("cents") - col("ws"))
      .withColumn("varn2", col("wn") * col("wq") - col("ws") * col("ws"))
      .withColumn("eval", col("wn") >= 3 && col("varn2") > 0)
      .withColumn("flag", col("eval") &&
        col("dev") * col("dev") > col("varn2") * 9)
    scored.groupBy(year(col("o_orderdate")).as("yr"))
      .agg(sum(when(col("eval"), 1L).otherwise(0L)).as("n_evaluated"),
        sum(when(col("flag"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("flag"), col("cents")).otherwise(0L)).as("flagged_cents"),
        sum(when(col("flag"), col("o_orderkey")).otherwise(0L)).as("flagged_key_sum"))
      .sortedOut("yr")
  }

  private val q200Sql =
    """WITH s AS (SELECT o_orderkey, o_orderdate,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    count(*) OVER w AS wn,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS ws,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) * CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS wq
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)),
      |f AS (SELECT *,
      |    wn >= 3 AND (wn * wq - ws * ws) > 0 AS eval,
      |    wn >= 3 AND (wn * wq - ws * ws) > 0
      |      AND (wn * cents - ws) * (wn * cents - ws) > (wn * wq - ws * ws) * 9 AS flag
      |  FROM s)
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(sum(CASE WHEN eval THEN 1 ELSE 0 END) AS BIGINT) AS n_evaluated,
      |  CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(sum(CASE WHEN flag THEN cents ELSE 0 END) AS BIGINT) AS flagged_cents,
      |  CAST(sum(CASE WHEN flag THEN o_orderkey ELSE 0 END) AS BIGINT) AS flagged_key_sum
      |FROM f GROUP BY 1 ORDER BY yr""".stripMargin

  // ------------------- Benford first-digit audit, integer-exact (q202)
  /** The forensic data-quality screen: leading-digit frequencies of
    * order amounts vs Benford's law. Fabricated or unit-mangled
    * financial columns drift from log₁₀(1+1/d); a census that runs at
    * ingest catches it before a model trains on it. Kept integer
    * end-to-end: the leading digit comes from the BIGINT cents
    * rendering (leading digit is invariant under the ×100 scaling;
    * BIGINT→string is identical in both engines, no fp formatting),
    * observed shares are parts-per-million by integer division, and
    * the Benford reference is the SAME hardcoded ppm literals on both
    * sides (so the deviation column is exact, not a log race).
    *
    * Scale shape: one map-side-combinable 9-group aggregate; the ppm
    * arithmetic happens on the 9-row result. */
  private def q202(s: SparkSession, d: String): DataFrame = {
    val benford = typedLit(Map(
      "1" -> 301030L, "2" -> 176091L, "3" -> 124939L, "4" -> 96910L,
      "5" -> 79181L, "6" -> 66947L, "7" -> 57992L, "8" -> 51153L,
      "9" -> 45757L))
    val digits = t(s, d, "orders")
      .select(substring(round(col("o_totalprice") * 100).cast(LongType)
        .cast(StringType), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("tot"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div tot").as("obs_ppm"),
        benford(col("digit")).as("benford_ppm"),
        (expr("n * 1000000 div tot") - benford(col("digit"))).as("dev_ppm"))
      .sortedOut("digit")
  }

  private val q202Sql =
    """WITH d AS (
      |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d),
      |b(digit, benford_ppm) AS (VALUES ('1', 301030), ('2', 176091),
      |  ('3', 124939), ('4', 96910), ('5', 79181), ('6', 66947),
      |  ('7', 57992), ('8', 51153), ('9', 45757))
      |SELECT d.digit, d.n,
      |  CAST(d.n * 1000000 // t.tot AS BIGINT) AS obs_ppm,
      |  CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
      |  CAST(d.n * 1000000 // t.tot - b.benford_ppm AS BIGINT) AS dev_ppm
      |FROM d JOIN b USING (digit) CROSS JOIN t ORDER BY digit""".stripMargin

  // ----------------- group-wise OLS trend, cleared denominators (q203)
  /** Per-segment linear trend (is this order-priority's spend rising?)
    * with the normal-equation fractions kept EXACT until the last
    * step: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over x =
    * epoch-day, y = cents. Every sum and both cleared numerator/
    * denominator are DECIMAL(38,0) integers (n·Σxy peaks ~10²⁰ — past
    * LONG, nowhere near 38 digits), so the only fp ops are the final
    * two decimal→double conversions and one IEEE division — identical
    * in both engines, which is what lets a regression coefficient be
    * hash-matched at all. Intercept follows as (Σy − slope·Σx)/n from
    * the same exact ingredients. The no-variance edge (a single
    * distinct x in a group) nulls the slope on both sides rather than
    * dividing by zero.
    *
    * Scale shape: one map-side-combinable aggregate per group carrying
    * five sums; the algebra runs on the |groups|-row result. This is
    * the q154/q175 fixed-point discipline applied to model fitting —
    * the 100 TB path for ANY per-group OLS is these five sums, never a
    * per-group collect. */
  private def q203(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val base = t(s, d, "orders")
      .select(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate").cast(DateType), lit("1970-01-01")
          .cast(DateType)).cast(LongType).as("x"),
        round(col("o_totalprice") * 100).cast(LongType).as("y"))
    val sums = base.groupBy("prio").agg(
      count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"))
    sums.select(col("prio"), col("n"),
        (dec(col("n")) * col("sxy") - col("sx") * col("sy")).as("num"),
        (dec(col("n")) * col("sxx") - col("sx") * col("sx")).as("den"),
        col("sx"), col("sy"))
      .select(col("prio"), col("n"), col("sx"), col("sy"),
        when(col("den") =!= 0,
          col("num").cast(DoubleType) / col("den").cast(DoubleType))
          .as("slope_cents_per_day"))
      .withColumn("intercept_cents",
        when(col("slope_cents_per_day").isNotNull,
          (col("sy").cast(DoubleType) - col("slope_cents_per_day") *
            col("sx").cast(DoubleType)) / col("n").cast(DoubleType)))
      .select(col("prio"), col("n"), col("slope_cents_per_day"),
        col("intercept_cents"))
      .sortedOut("prio")
  }

  private val q203Sql =
    """WITH base AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders),
      |sums AS (
      |  SELECT prio, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy
      |  FROM base GROUP BY prio)
      |SELECT prio, n,
      |  CASE WHEN n * sxx - sx * sx <> 0 THEN
      |    CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |  END AS slope_cents_per_day,
      |  CASE WHEN n * sxx - sx * sx <> 0 THEN
      |    (CAST(sy AS DOUBLE) -
      |     CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
      |  END AS intercept_cents
      |FROM sums ORDER BY prio""".stripMargin

  // ------------------------------ SCD2 dimension history (q103)
  /** [[RelationalOps.scd2]] over the events stream read as a CDC feed:
    * each user's `event_type` is the tracked attribute, so the history
    * is one row per type CHANGE with half-open validity intervals and
    * an `is_current` flag. `event_id` tiebreaks equal timestamps into
    * a total order (the fixture duplicates (user_id, ts)); intervals
    * are exported as epoch millis per the events-ts convention. */
  private def q103(s: SparkSession, d: String): DataFrame =
    RelationalOps.scd2(
        // ts enters pre-truncated to epoch millis so BOTH engines
        // order (and therefore collapse) at the same precision — at
        // raw µs/ns precision a sub-ms gap could order differently
        // here than in the oracle's epoch_ms view
        Tables.events(s, d).select(col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("event_id"), col("event_type")),
        key = Seq("user_id"), ts = "ts_ms", attrs = Seq("event_type"),
        tieBreak = Seq("event_id"))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from").as("from_ms"), col("valid_to").as("to_ms"),
        col("is_current"))
      .sortedOutWide("user_id", "version")

  private val q103Sql =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |s AS (SELECT *, lag(event_type) OVER w AS prev FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |c AS (SELECT * FROM s WHERE prev IS NULL OR prev != event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS INTEGER) AS version,
      |  event_type,
      |  ts_ms AS from_ms,
      |  lead(ts_ms) OVER w AS to_ms,
      |  lead(ts_ms) OVER w IS NULL AS is_current
      |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |ORDER BY user_id, version""".stripMargin

  // --------------------- incremental aggregate refresh (q105)
  /** [[RelationalOps.mergeAggState]] as a query: the standing per-
    * customer order stats (count, exact-decimal revenue, latest order
    * date) are built from a historical split, then refreshed with the
    * remaining orders as the "daily batch" — and the merged state must
    * equal the from-scratch aggregate the oracle computes over the
    * whole table. Split point chosen mid-fixture so both sides are
    * non-trivial at every SF. */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_custkey"),
      col("o_orderdate").cast(DateType).as("od"), d184(col("o_totalprice")).as("pr"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"), sum(col("pr")).as("revenue"),
        max(col("od")).as("last_order"))
    val cut = lit("1995-01-01").cast(DateType)
    val merged = RelationalOps.mergeAggState(
      partial(o.where(col("od") < cut)), partial(o.where(col("od") >= cut)),
      keys = Seq("o_custkey"),
      measures = Seq(("n_orders", "sum"), ("revenue", "sum"), ("last_order", "max")))
    merged.select(col("o_custkey"), col("n_orders"),
        dbl(col("revenue")).as("revenue"), col("last_order"))
      .sortedOutWide("o_custkey")
  }

  private val q105Sql =
    """SELECT o_custkey, count(*) AS n_orders,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      | max(CAST(o_orderdate AS DATE)) AS last_order
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ------------------- data-quality expectations report (q108)
  /** [[graft.ops.Expectations]] over the orders feed: the five check
    * kinds in ONE aggregate pass, reporting (check, metric, threshold,
    * pass). Deterministic counts/extrema → exact oracle; the
    * thresholds are chosen so the fixture yields a mixed pass/fail
    * report (a report that can't fail proves nothing). */
  private def q108(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Expectations._
    report(t(s, d, "orders"), Seq(
        NonNullRate("o_custkey", 0.99),
        UniqueKey(Seq("o_orderkey")),
        RowCountBetween(1L, 100000000L),
        ValuesIn("o_orderstatus", Seq("F", "O")), // fixture also has P -> fails
        InRange("o_totalprice", 0.0, 1000.0)))    // fixture exceeds -> fails
      .withColumnRenamed("check", "check_name")
      .sortedOutWide("check_name")
  }

  private val q108Sql =
    """WITH m AS (SELECT count(*) AS n,
      |  CAST(count(o_custkey) AS DOUBLE) AS m0,
      |  CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS m1,
      |  CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
      |        AND o_orderstatus NOT IN ('F','O') THEN 1 ELSE 0 END) AS DOUBLE) AS m3,
      |  CAST(min(o_totalprice) AS DOUBLE) AS mn4,
      |  CAST(max(o_totalprice) AS DOUBLE) AS mx4
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'non_null_rate(o_custkey)' AS check_name,
      |         m0 / CAST(greatest(n, 1) AS DOUBLE) AS metric,
      |         '>= 0.99' AS threshold,
      |         m0 / CAST(greatest(n, 1) AS DOUBLE) >= 0.99 AS pass FROM m
      |  UNION ALL
      |  SELECT 'unique_key(o_orderkey)', m1, '= row count', m1 = CAST(n AS DOUBLE) FROM m
      |  UNION ALL
      |  SELECT 'row_count[1,100000000]', CAST(n AS DOUBLE), '[1, 100000000]',
      |         n >= 1 AND n <= 100000000 FROM m
      |  UNION ALL
      |  SELECT 'values_in(o_orderstatus)', m3, '0 violations', m3 = 0 FROM m
      |  UNION ALL
      |  SELECT 'in_range(o_totalprice)', mx4, '[0.0, 1000.0]',
      |         mn4 >= 0.0 AND mx4 <= 1000.0 FROM m)
      |ORDER BY check_name""".stripMargin

  // ------------------------ weekly cohort retention (q109)
  /** Classic cohort-retention analysis: users grouped by first-active
    * week, counted in every later week they return — the
    * engagement-over-time read every event pipeline reports. ONE
    * shuffle keyed by user builds the per-user active-week SET
    * (bounded by the corpus' week span — 5 here, ~52/year at 100 TB —
    * never the raw event list), and the exploded (cohort, offset)
    * count is map-side combinable. The week index is
    * floor(epoch/604800): pure integer-range arithmetic with no
    * calendar semantics to diverge across engines, and a sub-second
    * fraction can never roll a value across a week boundary (the
    * boundary is a whole-second multiple). */
  private def q109(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"),
        floor(col("ts").cast("long") / lit(604800.0)).cast("long").as("wk"))
      .groupBy("user_id")
      .agg(min(col("wk")).as("cohort_wk"), collect_set(col("wk")).as("wks"))
      .select(col("cohort_wk"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .sortedOut("cohort_wk", "week_offset")

  private val q109Sql =
    """WITH uw AS (SELECT DISTINCT user_id,
      |              CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk FROM events),
      | c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
      |SELECT c.cohort_wk, uw.wk - c.cohort_wk AS week_offset, count(*) AS n_users
      |FROM uw JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------- ordered three-step funnel (q110)
  /** Ordered funnel (view → click → purchase): per user, the first
    * view, the first click at-or-after it, and the first purchase
    * at-or-after that click — the ORDER-sensitive sequence measure a
    * per-step unconditional min cannot express (a purchase before any
    * view must not count). ONE shuffle: the per-user funnel events are
    * collected once (only the three step types survive the scan
    * filter) and each step is an array filter+min over that list — no
    * self-joins, no windows, and the chained mins are purely numeric,
    * so the result is independent of collection order. Seconds
    * granularity on both engines (ties compare >=). */
  private def q110(s: SparkSession, d: String): DataFrame =
    RelationalOps.funnelSteps(Tables.events(s, d),
        entity = col("user_id"), orderKey = col("ts").cast("long"),
        stepType = col("event_type"), steps = Seq("view", "click", "purchase"))
      .withColumnRenamed("entity", "user_id")
      .sortedOutWide("user_id")

  private val q110Sql =
    """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_type
      |           FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      | u AS (SELECT DISTINCT user_id FROM e),
      | v AS (SELECT user_id, min(tsec) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
      | c AS (SELECT e.user_id, min(tsec) AS t_click FROM e JOIN v USING (user_id)
      |       WHERE event_type = 'click' AND tsec >= t_view GROUP BY 1),
      | p AS (SELECT e.user_id, min(tsec) AS t_purchase FROM e JOIN c USING (user_id)
      |       WHERE event_type = 'purchase' AND tsec >= t_click GROUP BY 1)
      |SELECT u.user_id, t_view, t_click, t_purchase,
      | CASE WHEN t_purchase IS NOT NULL THEN 3 WHEN t_click IS NOT NULL THEN 2
      |      WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS step_reached
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |       LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  // -------------------- half-life decayed engagement (q111)
  /** Recency-weighted engagement score per user (the freshness prior a
    * training mix applies to interaction data): each event in the last
    * 16 days contributes floor(100·value) · 2^(15 − age_days), a
    * one-day half-life expressed ENTIRELY in integer arithmetic — the
    * decay is a left shift, so the sum is exact, order-independent,
    * and engine-identical (no float accumulation to diverge under
    * repartitioning). The reference day is the corpus max: ONE scalar
    * aggregate broadcast back over the scan (the BM25 stats pattern),
    * not a driver-side constant. Bound: 100·value < 2^16, shift ≤ 15,
    * so even 2^30 events per user cannot overflow the long. */
  private def q111(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"),
      floor(col("ts").cast("long") / lit(86400.0)).cast("long").as("day"),
      col("value"))
    val ref = e.agg(max(col("day")).as("ref_day"))
    e.crossJoin(broadcast(ref))
      .where(col("ref_day") - col("day") <= 15)
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 100).cast("long") *
        call_function("shiftleft", lit(1L),
          (lit(15) - (col("ref_day") - col("day"))).cast("int"))).as("score"))
      .sortedOutWide("user_id")
  }

  private val q111Sql =
    """WITH e AS (SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, value
      |           FROM events),
      | r AS (SELECT max(day) AS ref_day FROM e)
      |SELECT user_id,
      | CAST(sum(CAST(floor(value * 100) AS BIGINT)
      |          * (CAST(1 AS BIGINT) << CAST(15 - (ref_day - day) AS INTEGER))) AS BIGINT) AS score
      |FROM e CROSS JOIN r
      |WHERE ref_day - day <= 15
      |GROUP BY 1 ORDER BY user_id""".stripMargin

  // -------------------------- weighted trade-graph PageRank (q117)
  /** Which nations sit at the center of the trade network: weighted
    * PageRank over the customer-nation → supplier-nation graph, edge
    * weight = revenue flow (exact DECIMAL(18,4) sum, exported as
    * integer 10⁻⁴ currency units). [[graft.ops.Graph.pageRank]], 3
    * power iterations, d = 0.85.
    *
    * Scale shape: the fact-table joins (lineitem ⋈ orders shuffles on
    * orderkey; customer/supplier dims broadcast) collapse 100 TB of
    * line items into a ≤ N² edge list ONCE; every iteration after that
    * is a shuffle bounded by |edges|, never the fact table. Every
    * double sum inside the iteration is an ordered sequential fold, so
    * the rank VALUES (not just the ranking) hash-match the oracle's
    * unrolled 3-iteration SQL. */
  private def q117(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      d184(col("l_extendedprice")).as("price"))
    val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"), col("price"))
      .groupBy("src", "dst")
      .agg((sum(col("price")) * lit(10000)).cast(LongType).as("w"))
    val nation = t(s, d, "nation")
    val pr = graft.ops.Graph.pageRank(edges, nation.select("n_nationkey"), iters = 3)
    pr.join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        pr("node") === col("n_nationkey"))
      .select(col("n_nationkey"), col("n_name"), col("rank"))
      .sortedOut("n_nationkey")
  }

  /** Mirrors Graph.pageRank exactly: same fold orders (`list_sum(list(c
    * ORDER BY src))` = Spark's sorted-struct fold), same literal
    * arithmetic shapes ((1.0-0.85)/N computed at runtime on both
    * sides), uniform dangling redistribution included even though the
    * fixture graph has none — the oracle must mirror the OPERATOR, not
    * the fixture. */
  private val q117Sql = {
    def iter(prev: String, cur: String) =
      s"""d$cur AS (
         |  SELECT coalesce(list_sum(list(rank ORDER BY node)), 0.0) AS dang
         |  FROM r$prev WHERE node NOT IN (SELECT DISTINCT src FROM e)),
         |i$cur AS (
         |  SELECT e.dst, e.src, r.rank * e.frac AS c
         |  FROM e JOIN r$prev r ON e.src = r.node),
         |s$cur AS (SELECT dst, list_sum(list(c ORDER BY src)) AS inflow
         |          FROM i$cur GROUP BY dst),
         |r$cur AS (
         |  SELECT n.node,
         |         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
         |           + CAST(0.85 AS DOUBLE) * (coalesce(s.inflow, CAST(0.0 AS DOUBLE)) + d.dang / nn.n) AS rank
         |  FROM nodes n LEFT JOIN s$cur s ON n.node = s.dst
         |  CROSS JOIN d$cur d CROSS JOIN nn)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |wout AS (SELECT src, CAST(sum(w) AS BIGINT) AS wo FROM e0 GROUP BY 1),
       |e AS (SELECT e0.src, e0.dst, CAST(e0.w AS DOUBLE) / CAST(wout.wo AS DOUBLE) AS frac
       |      FROM e0 JOIN wout ON e0.src = wout.src),
       |nodes AS (SELECT n_nationkey AS node FROM nation),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
       |${iter("0", "1")},
       |${iter("1", "2")},
       |${iter("2", "3")}
       |SELECT r3.node AS n_nationkey, na.n_name, r3.rank
       |FROM r3 JOIN nation na ON na.n_nationkey = r3.node
       |ORDER BY n_nationkey""".stripMargin
  }

  // ------------------- HITS hubs & authorities on the trade graph (q136)
  /** [[graft.ops.Graph.hits]] on q117's nation→nation trade-volume
    * graph: hubs = nations whose purchasing concentrates on the
    * best-supplying nations, authorities = nations the heavy buyers
    * source from — the directed-centrality pair a link-graph curation
    * mix wants next to PageRank. Same scale contract as q117: the fact
    * table collapses to the ≤N² edge list once, each of the 2 rounds
    * is |edges|-bounded, every double sum is an ordered fold so hub
    * AND auth VALUES hash-match the unrolled oracle. */
  private def q136(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      d184(col("l_extendedprice")).as("price"))
    val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"), col("price"))
      .groupBy("src", "dst")
      .agg((sum(col("price")) * lit(10000)).cast(LongType).as("w"))
    val nation = t(s, d, "nation")
    val hs = graft.ops.Graph.hits(edges, nation.select("n_nationkey"), iters = 2)
    hs.join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        hs("node") === col("n_nationkey"))
      .select(col("n_nationkey"), col("n_name"), col("hub"), col("auth"))
      .sortedOut("n_nationkey")
  }

  /** Mirrors Graph.hits exactly: L1 normalizers and per-node inflows
    * as `list_sum(list(c ORDER BY ...))` — the same ordered-fold
    * convention q117 pins. */
  private val q136Sql = {
    def round(prev: String, cur: String) =
      s"""ar$cur AS (
         |  SELECT e.dst, e.src, h.hub * e.w AS c
         |  FROM e JOIN h$prev h ON e.src = h.node),
         |asum$cur AS (SELECT dst, list_sum(list(c ORDER BY src)) AS raw
         |             FROM ar$cur GROUP BY dst),
         |aall$cur AS (SELECT n.node, coalesce(s.raw, CAST(0.0 AS DOUBLE)) AS raw
         |             FROM nodes n LEFT JOIN asum$cur s ON n.node = s.dst),
         |atot$cur AS (SELECT list_sum(list(raw ORDER BY node)) AS tot FROM aall$cur),
         |a$cur AS (SELECT node, raw / tot AS auth FROM aall$cur CROSS JOIN atot$cur),
         |hr$cur AS (
         |  SELECT e.src, e.dst, a.auth * e.w AS c
         |  FROM e JOIN a$cur a ON e.dst = a.node),
         |hsum$cur AS (SELECT src, list_sum(list(c ORDER BY dst)) AS raw
         |             FROM hr$cur GROUP BY src),
         |hall$cur AS (SELECT n.node, coalesce(s.raw, CAST(0.0 AS DOUBLE)) AS raw
         |             FROM nodes n LEFT JOIN hsum$cur s ON n.node = s.src),
         |htot$cur AS (SELECT list_sum(list(raw ORDER BY node)) AS tot FROM hall$cur),
         |h$cur AS (SELECT node, raw / tot AS hub FROM hall$cur CROSS JOIN htot$cur)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |e AS (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM e0),
       |nodes AS (SELECT n_nationkey AS node FROM nation),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |h0 AS (SELECT node, 1.0 / nn.n AS hub FROM nodes CROSS JOIN nn),
       |${round("0", "1")},
       |${round("1", "2")}
       |SELECT h2.node AS n_nationkey, na.n_name, h2.hub, a2.auth
       |FROM h2 JOIN a2 ON a2.node = h2.node
       |JOIN nation na ON na.n_nationkey = h2.node
       |ORDER BY n_nationkey""".stripMargin
  }

  // ---------------- session co-occurrence / lift mining (q120)
  /** Market-basket association over behavioral sessions: which event
    * types co-occur in the same session beyond chance. Sessions are
    * q43's 30-min-gap definition; each session contributes its DISTINCT
    * type set once; support counts per pair and per type roll up with
    * lift = P(ab)/(P(a)·P(b)) as the association strength.
    *
    * Scale shape: ONE user-keyed shuffle builds sessions (the same
    * window q43 pins); each session collapses to its sorted type SET
    * (bounded by |event types|, never the event list) before anything
    * else happens; the a<b pair expansion is a per-row array transform
    * (|T|²/2 structs from a tiny array, no self-join, no extra
    * shuffle) and both count rollups combine map-side. The |T|-row
    * support table and the 1-row session count broadcast back onto the
    * |T|² output. Lift is a single (a·b)/(c·d) double expression —
    * deterministic, mirrored verbatim in the oracle (which generates
    * pairs by self-join: same set semantics, SQL-friendlier shape). */
  private def q120(s: SparkSession, d: String): DataFrame =
    sessionCoOccurrence(Tables.events(s, d))

  /** q120's kernel on any events frame with (user_id, ts, event_id,
    * event_type) — public so the adversarial sweep can drive it with a
    * power-user corpus (one user, 10⁵ events) that the fixture's
    * uniform events never produce. */
  def sessionCoOccurrence(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMs = 30 * 60000L
    val sess = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > gapMs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val types = sess.groupBy("user_id", "sid")
      .agg(array_sort(collect_set(col("event_type"))).as("tys"))
      .persistT // feeds pair counts, per-type support, and the session count
    val nSessions = types.agg(count(lit(1)).as("n_sessions"))
    val single = types.select(explode(col("tys")).as("ty"))
      .groupBy("ty").agg(count(lit(1)).as("n"))
    val pairArr = flatten(transform(col("tys"), (x, i) =>
      transform(slice(col("tys"), i + lit(2), size(col("tys"))), y =>
        struct(x.as("a"), y.as("b")))))
    val pc = types.select(explode(pairArr).as("p"))
      .select(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
    pc.crossJoin(broadcast(nSessions))
      .join(broadcast(single.select(col("ty").as("type_a"), col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(single.select(col("ty").as("type_b"), col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_sessions"),
        ((col("n_ab").cast(DoubleType) * col("n_sessions").cast(DoubleType)) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType))).as("lift"))
      .sortedOut("type_a", "type_b")
  }

  // -------------- conversation assembly with truncation (q131)
  /** Instruction-tuning data prep: each session becomes one training
    * "conversation" — turns ordered by (ts, event_id), TRUNCATED to
    * the first 8 (max-turn truncation is what real chat pipelines do,
    * and it is also what makes the state bounded: the row_number
    * filter runs BEFORE any collect, so the mega-session contributes 8
    * rows to the assembly, never 10⁵ — the q120 discipline applied to
    * ordered turn lists instead of distinct type sets). Emits the
    * turn-type sequence as a joined string (array-output rendering
    * diverges across engines; the '>' join is the q79 convention),
    * plus kept-turn count and time span. Exactly oracled. */
  private def q131(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMs = 30 * 60000L
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val kept = sess.withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "sid").orderBy(col("ts"), col("event_id"))))
      .where(col("rn") <= 8)
    kept.groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_turns"),
        concat_ws(">", transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          t => t.getField("event_type"))).as("turns"),
        (max(col("ms")) - min(col("ms"))).as("span_ms"))
      .select(col("user_id"), col("sid").cast("long").as("sid"),
        col("n_turns"), col("turns"), col("span_ms"))
      .sortedOut("user_id", "sid")
  }

  private val q131Sql =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      |  FROM events),
      |y AS (
      |  SELECT *, CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM y),
      |t AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
      |                                   ORDER BY ts, event_id) AS rn FROM z),
      |k AS (SELECT * FROM t WHERE rn <= 8)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid,
      |       count(*) AS n_turns,
      |       string_agg(event_type, '>' ORDER BY rn) AS turns,
      |       CAST(max(epoch_ms(ts)) - min(epoch_ms(ts)) AS BIGINT) AS span_ms
      |FROM k GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin

  private val q120Sql =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      |  FROM events),
      |y AS (
      |  SELECT *, CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM y),
      |t AS (SELECT user_id, sid, list_sort(list(DISTINCT event_type)) AS tys
      |      FROM z GROUP BY user_id, sid),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM t),
      |ex AS (SELECT user_id, sid, unnest(tys) AS ty FROM t),
      |single AS (SELECT ty, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY ty),
      |pc AS (SELECT a.ty AS type_a, b.ty AS type_b, CAST(count(*) AS BIGINT) AS n_ab
      |       FROM ex a JOIN ex b ON a.user_id = b.user_id AND a.sid = b.sid AND a.ty < b.ty
      |       GROUP BY 1, 2)
      |SELECT type_a, type_b, n_ab, sa.n AS n_a, sb.n AS n_b, n_sessions,
      |       (CAST(n_ab AS DOUBLE) * CAST(n_sessions AS DOUBLE)) /
      |         (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
      |FROM pc CROSS JOIN n
      |JOIN single sa ON sa.ty = pc.type_a
      |JOIN single sb ON sb.ty = pc.type_b
      |ORDER BY type_a, type_b""".stripMargin

  // -------------- SCD2 point-in-time lookup (q141)
  /** The standard CONSUMPTION pattern for q103's SCD2 dimension — the
    * feature-store "as-of the event" lookup: every sampled event joins
    * to the dimension version whose validity interval contains its
    * timestamp. SCD2 intervals partition each key's timeline, so the
    * join is an EQUI join on the key plus an in-row interval predicate
    * — per-key version chains are bounded (change counts, not event
    * counts), which keeps the probe a plain hash join at any corpus
    * size; un-keyed interval probes would ride the range-join rewrite
    * (q53/q68) instead. Timestamps travel pre-truncated to epoch ms
    * (q103's cross-engine precision convention). Empty intervals
    * (same-ms version flips) match nothing, so each probe lands in
    * EXACTLY one version — row count = probe count, spec-free proof
    * the interval algebra is right. */
  private def q141(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      unix_millis(col("ts")).as("ts_ms"), col("event_id"), col("event_type"))
    val dim = RelationalOps.scd2(ev, key = Seq("user_id"), ts = "ts_ms",
        attrs = Seq("event_type"), tieBreak = Seq("event_id"))
      .select(col("user_id").as("d_user_id"), col("version"),
        col("event_type").as("state_type"), col("valid_from"), col("valid_to"))
    val probes = ev.where(col("event_id") % 10 === 0)
    probes.join(dim,
        probes("user_id") === col("d_user_id") &&
          col("valid_from") <= col("ts_ms") &&
          (col("valid_to").isNull || col("ts_ms") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("event_type"), col("version"), col("state_type"))
      .sortedOutWide("event_id")
  }

  private val q141Sql =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |s AS (SELECT *, lag(event_type) OVER w AS prev FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |c AS (SELECT * FROM s WHERE prev IS NULL OR prev != event_type),
      |dim AS (SELECT user_id AS d_user_id,
      |          CAST(row_number() OVER w AS INTEGER) AS version,
      |          event_type AS state_type,
      |          ts_ms AS valid_from, lead(ts_ms) OVER w AS valid_to
      |        FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |p AS (SELECT event_id, user_id, ts_ms, event_type FROM e WHERE event_id % 10 = 0)
      |SELECT p.event_id, p.user_id, p.ts_ms, p.event_type, d.version, d.state_type
      |FROM p JOIN dim d ON d.d_user_id = p.user_id
      |  AND d.valid_from <= p.ts_ms
      |  AND (d.valid_to IS NULL OR p.ts_ms < d.valid_to)
      |ORDER BY p.event_id""".stripMargin

  // ------------- event-type transition matrix (q148)
  /** First-order Markov transitions over each user's event stream —
    * the behavioral fingerprint that powers next-event prediction
    * features, bot detection (improbable transition chains) and
    * session-simulation test data. For every (from, to) event-type
    * pair: the observed count and the row-normalized transition
    * probability P(to | from).
    *
    * Scale shape: ONE user-keyed shuffle (the same partitioning every
    * session query in this family rides); `lead` runs inside the
    * per-user sort, the pair count combines map-side into a ≤|T|²
    * frame, and the row normalization is a window over that tiny
    * matrix — no second pass over the events. The (ts, event_id)
    * ordering is total, so the transition stream is deterministic. */
  private def q148(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast(DoubleType) /
        sum(col("n")).over(Window.partitionBy("from_type")).cast(DoubleType))
      .sortedOut("from_type", "to_type")
  }

  private val q148Sql =
    """WITH x AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) /
      |    CAST(CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE) AS p
      |FROM t ORDER BY from_type, to_type""".stripMargin

  // ------------- trade-graph triangle census (q152)
  /** [[graft.ops.Graph.triangleStats]] on the strong-tie trade graph:
    * nation pairs whose trade volume clears half the average edge
    * weight (the threshold sparsifies the near-complete raw graph into
    * actual structure), then the exact triangle count and global
    * clustering coefficient. The cohesion statistic beside q117/q136's
    * centralities — organic communities close their wedges, hub-spoke
    * syndication doesn't.
    *
    * Scale: the fact table collapses to the ≤|V|² weighted edge list
    * once (the q117/q136 discipline); the census itself runs on the
    * degree-ordered orientation, bounding per-node join work by
    * O(√|E|) however hot a hub is. All-integer until the final
    * division. */
  private def q152(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      d184(col("l_extendedprice")).as("price"))
    val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val e0 = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"), col("price"))
      .groupBy("src", "dst")
      .agg((sum(col("price")) * lit(10000)).cast(LongType).as("w"))
    val thr = e0.agg((sum(col("w")).cast(DoubleType) /
      count(lit(1)).cast(DoubleType)).as("avg_w"))
    val strong = e0.crossJoin(broadcast(thr))
      .where(col("w").cast(DoubleType) >= col("avg_w") * 0.5)
      .select("src", "dst")
    graft.ops.Graph.triangleStats(strong)
  }

  private val q152Sql =
    """WITH e0 AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
      |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |thr AS (SELECT CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_w FROM e0),
      |strong AS (SELECT src, dst FROM e0 CROSS JOIN thr
      |           WHERE CAST(w AS DOUBLE) >= avg_w * 0.5),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |        FROM strong WHERE src <> dst),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      |        FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
      |        GROUP BY node),
      |tri AS (SELECT CAST(count(*) AS BIGINT) AS t
      |        FROM und e1
      |        JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
      |        JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
      |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |               CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
      |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
      |SELECT n_nodes, n_edges, n_wedges, t AS n_triangles,
      |  CAST(t AS DOUBLE) * 3.0 / CAST(n_wedges AS DOUBLE) AS clustering
      |FROM agg CROSS JOIN ne CROSS JOIN tri""".stripMargin

  // ------------- behavioral diversity: per-user Gini impurity (q165)
  /** How varied is each user's behavior: Gini impurity 1 − Σ pₜ² over
    * the user's event-type mix — the bot/monoculture detector next to
    * the transition matrix (q148): scripted accounts sit near 0, and a
    * sudden corpus-wide Gini shift means the event taxonomy or the
    * traffic changed. Gini instead of entropy BY CHOICE: it needs no
    * log, so with the per-type shares folded in event-type order every
    * double is exactly reproducible cross-engine.
    *
    * Scale shape: one (user, type) count pass with map-side combine,
    * then a per-user fold over ≤|T| types. */
  private def q165(s: SparkSession, d: String): DataFrame = {
    val c = Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    c.groupBy("user_id")
      .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_types"),
           sort_array(collect_list(struct(col("event_type"), col("c")))).as("cs"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        (lit(1.0) - aggregate(col("cs"), lit(0.0), (acc, v) =>
          acc + (v.getField("c").cast(DoubleType) / col("n_events").cast(DoubleType)) *
                (v.getField("c").cast(DoubleType) / col("n_events").cast(DoubleType)))).as("gini"))
      .sortedOutWide("user_id")
  }

  private val q165Sql =
    """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |g AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
      |        CAST(count(*) AS BIGINT) AS n_types,
      |        list(c ORDER BY event_type) AS cs
      |      FROM c GROUP BY user_id)
      |SELECT user_id, n_events, n_types,
      |  1.0 - list_sum(list_transform(cs, x ->
      |    (CAST(x AS DOUBLE) / CAST(n_events AS DOUBLE))
      |    * (CAST(x AS DOUBLE) / CAST(n_events AS DOUBLE)))) AS gini
      |FROM g ORDER BY user_id""".stripMargin

  // ----------------- referential-integrity audit (q181)
  /** The ETL data-quality gate the reference pipeline's domain
    * implies but never checks: orphan foreign keys across the star
    * (lineitem→orders/part/supplier, orders→customer) plus the
    * fan-out profile (max/mean lineitems per order). Run BEFORE a
    * publish step, this is what catches a partial upstream load — a
    * missing dimension partition shows up as orphan counts, not as
    * silently-shrunken inner joins downstream.
    *
    * Scale shape: each orphan count is a LEFT ANTI join — dimension
    * sides broadcast when small, and the anti join never materializes
    * matches; the fan-out is one map-side-combinable count. Mean
    * fan-out is a single integer-over-integer division. */
  private def q181(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").persistT // four probes below
    val orders = t(s, d, "orders").persistT
    def orphans(fact: DataFrame, key: String, dim: DataFrame, dimKey: String) =
      fact.select(col(key)).join(
        broadcast(dim.select(col(dimKey).as(key)).distinct()),
        Seq(key), "left_anti").count()
    val oOrd = orphans(li, "l_orderkey", orders, "o_orderkey")
    val oPart = orphans(li, "l_partkey", t(s, d, "part"), "p_partkey")
    val oSupp = orphans(li, "l_suppkey", t(s, d, "supplier"), "s_suppkey")
    val oCust = orphans(orders, "o_custkey", t(s, d, "customer"), "c_custkey")
    val fan = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_orders_ref"), max(col("n")).as("max_fanout"),
        sum(col("n")).as("n_lines"))
    fan.select(col("n_lines"), col("n_orders_ref"), col("max_fanout"),
      (col("n_lines").cast("double") / col("n_orders_ref").cast("double")).as("mean_fanout"),
      lit(oOrd).as("orphan_order_refs"), lit(oCust).as("orphan_cust_refs"),
      lit(oPart).as("orphan_part_refs"), lit(oSupp).as("orphan_supp_refs"))
  }

  private val q181Sql =
    """WITH fan AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1)
      |SELECT CAST(sum(n) AS BIGINT) AS n_lines,
      |  CAST(count(*) AS BIGINT) AS n_orders_ref,
      |  max(n) AS max_fanout,
      |  CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_fanout,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_order_refs,
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphan_cust_refs,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |   WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS orphan_part_refs,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |   WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS orphan_supp_refs
      |FROM fan""".stripMargin

  // ----------------- Pareto frontier / skyline, integer-exact (q204)
  /** The dominance query family's first member: the set of
    * (price, size) points no other part dominates — cheaper-and-bigger
    * wins, so the frontier is every catalog's "efficient" boundary
    * (best value at each budget). Dominance is evaluated on LONG cents
    * and LONG size, so membership is exact, and the census at each
    * frontier point (how many parts sit exactly there, key checksum)
    * pins WHICH parts are efficient, not just how many.
    *
    * 2D skyline decomposes into two bounded passes instead of the
    * quadratic NOT-EXISTS definition: (1) collapse to one candidate
    * per distinct price — only the max-size point at a price can
    * survive (an equal-price larger point dominates, price strict not
    * needed because size is strict); (2) a running max over strictly
    * cheaper candidates — survive iff size exceeds it (a cheaper
    * point with ≥ size dominates via strict price). The oracle is the
    * same decomposition, so one point mis-kept or mis-dropped by
    * either pass fails the hash.
    *
    * Scale shape: pass 1 is a map-side-combinable (price, size) group
    * then a per-price window; pass 2's unpartitioned running max runs
    * over ONE ROW PER DISTINCT PRICE — bounded by the cents domain
    * (~10⁵ for this schema), not the data, the q198-rollup argument.
    * For an unbounded value domain the running max takes the
    * [[RelationalOps.globalRowNumber]] range-partition + prefix
    * formulation; the frontier itself only shrinks as data grows. */
  private def q204(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = t(s, d, "part")
      .select(round(col("p_retailprice") * 100).cast(LongType).as("price_cents"),
        col("p_size").cast(LongType).as("size"), col("p_partkey"))
      .groupBy("price_cents", "size")
      .agg(count(lit(1)).as("n_parts"), sum(col("p_partkey")).as("key_sum"))
    val cand = g
      .withColumn("mx", max(col("size")).over(Window.partitionBy("price_cents")))
      .where(col("size") === col("mx")).drop("mx")
    // exclusive running max via the DISTRIBUTED prefix scan — the old
    // `max(size).over(Window.orderBy(price).rowsBetween(-inf, -1))`
    // sank the whole candidate frame through one task
    RelationalOps.globalRunningMax(cand, Seq(col("price_cents").asc),
        "size", "runmax", inclusive = false)
      .where(col("runmax").isNull || col("size") > col("runmax"))
      .select("price_cents", "size", "n_parts", "key_sum")
      .sortedOut("price_cents")
  }

  private val q204Sql =
    """WITH p AS (SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
      |    CAST(p_size AS BIGINT) AS size, p_partkey FROM part),
      |g AS (SELECT price_cents, size, CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(sum(p_partkey) AS BIGINT) AS key_sum
      |  FROM p GROUP BY 1, 2),
      |c AS (SELECT * FROM (
      |    SELECT g.*, max(size) OVER (PARTITION BY price_cents) AS mx FROM g)
      |  WHERE size = mx),
      |f AS (SELECT *, max(size) OVER (ORDER BY price_cents
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax FROM c)
      |SELECT price_cents, size, n_parts, key_sum FROM f
      |WHERE runmax IS NULL OR size > runmax ORDER BY price_cents""".stripMargin

  // ------- chi-squared independence audit, cleared denominators (q205)
  /** Is `lang` independent of `source` in the corpus? The χ² statistic
    * answers the data-audit question "did one feed's language mix
    * drift" before a sampler trusts per-source quotas. Each cell's
    * contribution (O−E)²/E is kept EXACT until one division by
    * clearing E = R·C/N: contribution = (N·O − R·C)² / (N·R·C), with
    * numerator and denominator both DECIMAL(38,0) integers exported as
    * canonical digit strings (the q01 policy — no decimal→double loss
    * at any magnitude), and the double quotient is one IEEE division
    * from the same two exact integers in both engines — the q203
    * discipline applied to a test statistic. The global χ² is the sum
    * of the per-cell doubles; it is NOT emitted because fp addition
    * order would make it engine-dependent — consumers fold the exact
    * cells instead.
    *
    * Scale shape: one map-side-combinable (lang, source) count; the
    * marginals derive from the CELLS (≤|L|·|S| rows), never a second
    * corpus pass; broadcast joins assemble the ≤|L|·|S| output. At
    * 100 TB the contingency table is still tiny — this is the
    * always-cheap audit beside q149's heavier distributional alarm. */
  private def q205(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val cells = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("lang").agg(sum(col("o")).as("r"))
    val colsm = cells.groupBy("source").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"))
    cells.join(broadcast(rows), Seq("lang"))
      .join(broadcast(colsm), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("diff", dec(col("n")) * dec(col("o")) - dec(col("r")) * dec(col("c")))
      .withColumn("chi_num", col("diff") * col("diff"))
      .withColumn("chi_den", dec(col("n")) * dec(col("r")) * dec(col("c")))
      .select(col("lang"), col("source"), col("o"), col("r"), col("c"), col("n"),
        col("chi_num").cast(StringType).as("chi_num"),
        col("chi_den").cast(StringType).as("chi_den"),
        (col("chi_num").cast(DoubleType) / col("chi_den").cast(DoubleType))
          .as("contrib"))
      .sortedOut("lang", "source")
  }

  private val q205Sql =
    """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |x AS (SELECT cells.lang, cells.source, cells.o, r.r, c.c, t.n,
      |    CAST(t.n AS HUGEINT) * cells.o - CAST(r.r AS HUGEINT) * c.c AS diff
      |  FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t)
      |SELECT lang, source, o, r, c, n,
      |  CAST(diff * diff AS VARCHAR) AS chi_num,
      |  CAST(CAST(n AS HUGEINT) * r * c AS VARCHAR) AS chi_den,
      |  CAST(diff * diff AS DOUBLE) / CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE) AS contrib
      |FROM x ORDER BY lang, source""".stripMargin

  // -------- grid-bucketed spatial proximity self-join (q206)
  /** The spatial member of the similarity-join family (dense cosine
    * q58 / Jaccard q56 / Hamming q151): all point pairs within
    * Euclidean radius r, via fixed-grid bucketing. Each customer gets
    * a deterministic position in a 10⁶×10⁶ integer grid from two
    * independent seeded md5-60 draws (the engine-wide convention, so
    * the oracle reproduces the geometry bit-for-bit); with cell size
    * EQUAL to r, any qualifying pair's cells differ by ≤1 per axis —
    * a THEOREM, so the 3×3-neighborhood equi-join is
    * completeness-proven like q201's deletion neighborhoods, while the
    * oracle checks every pair EXHAUSTIVELY. One side explodes to its 9
    * neighbor cells, the other stays home: each qualifying pair meets
    * exactly once (the home cell is a unique key in the 9-set), and
    * `a_id < b_id` kills the mirrored orientation. The distance test
    * `dx²+dy² ≤ r²` is pure LONG arithmetic — no sqrt, no fp.
    *
    * Scale shape: one equi-join shuffle on the cell key; the 9×
    * replication is a constant, and per-cell population — the join's
    * skew bound — is data density × r², the knob a 100 TB run turns
    * (smaller r or a second-level salt on hot cells, q64's recipe).
    * Output is the pair list itself (q29 convention), which grows with
    * density² — a production run caps per-cell candidates like
    * [[graft.dedup.Dedup]]'s banded pairs. */
  private def q206(s: SparkSession, d: String): DataFrame = {
    val R = 10000L
    val pts = t(s, d, "customer")
      .select(col("c_custkey").as("id"),
        (graft.text.Hashing.h60Seeded(1, col("c_custkey")) % 1000000L).as("x"),
        (graft.text.Hashing.h60Seeded(2, col("c_custkey")) % 1000000L).as("y"))
      .withColumn("cx", expr(s"x div $R")).withColumn("cy", expr(s"y div $R"))
    val lhs = pts
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("dx")).as("gx"), (col("cy") + col("dy")).as("gy"))
    val rhs = pts.select(col("id").as("b_id"), col("x").as("bx"),
      col("y").as("by"), col("cx").as("gx"), col("cy").as("gy"))
    lhs.join(rhs, Seq("gx", "gy"))
      .where(col("a_id") < col("b_id"))
      .withColumn("dist_sq",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .where(col("dist_sq") <= R * R)
      .select("a_id", "b_id", "dist_sq")
      .sortedOutWide("a_id", "b_id")
  }

  private val q206Sql =
    """WITH p AS (SELECT c_custkey AS id,
      |    CAST(concat('0x', substr(md5('1:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS x,
      |    CAST(concat('0x', substr(md5('2:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS y
      |  FROM customer)
      |SELECT a.id AS a_id, b.id AS b_id,
      |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
      |FROM p a JOIN p b ON a.id < b.id
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 100000000
      |ORDER BY a_id, b_id""".stripMargin

  // ------- Cohen's kappa: consecutive-event agreement (q207)
  /** Inter-rater agreement applied to behavior: how much does a user's
    * NEXT event type agree with the current one beyond what the
    * marginal type mix predicts? Raw repeat-rate (q148's diagonal)
    * confounds stickiness with popularity — a feed where 90% of events
    * are 'view' repeats 81% by chance alone. Kappa corrects exactly
    * that: κ = (pₒ−pₑ)/(1−pₑ) with pₒ = D/N, pₑ = ΣRₖCₖ/N², cleared to
    * κ = (N·D − ΣRC)/(N² − ΣRC) — every term a DECIMAL(38,0) integer
    * (N² passes LONG at corpus scale), one IEEE division at the end,
    * the q203 discipline applied to an agreement statistic. Marginals
    * are FULL-OUTER-merged on the class label: a type appearing only
    * as successor still contributes its R=0 row. The degenerate
    * single-class corpus (pₑ=1) nulls κ instead of dividing by zero.
    *
    * Scale shape: one user-keyed shuffle for the lead (the q148
    * partitioning), then everything runs on the ≤|T|² confusion
    * matrix; the cleared sums are |T|-sized folds. */
  private def q207(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val conf = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("o"))
    val r = conf.groupBy(col("from_type").as("k")).agg(sum(col("o")).as("r"))
    val c0 = conf.groupBy(col("to_type").as("k")).agg(sum(col("o")).as("c"))
    // full-outer merge of the marginals, reformulated as label-spine +
    // two broadcast LEFT joins: Spark cannot broadcast-hash a FULL
    // OUTER join, so the direct form sort-merges two |T|-row frames
    // through an exchange (planLint finding); the spine form is
    // value-identical and stays broadcast.
    val labels = r.select("k").union(c0.select("k")).distinct()
    val src = labels
      .join(broadcast(r), Seq("k"), "left_outer")
      .join(broadcast(c0), Seq("k"), "left_outer")
      .agg(sum(dec(coalesce(col("r"), lit(0L))) *
        dec(coalesce(col("c"), lit(0L)))).cast(DecimalType(38, 0)).as("src"))
    val t0 = conf.agg(sum(col("o")).as("n_pairs"),
      sum(when(col("from_type") === col("to_type"), col("o"))
        .otherwise(0L)).as("sum_diag"))
    t0.crossJoin(broadcast(src))
      .select(col("n_pairs"), col("sum_diag"),
        col("src").cast(StringType).as("sum_rc"),
        when(dec(col("n_pairs")) * dec(col("n_pairs")) - col("src") =!= 0,
          (dec(col("n_pairs")) * dec(col("sum_diag")) - col("src"))
            .cast(DoubleType) /
            (dec(col("n_pairs")) * dec(col("n_pairs")) - col("src"))
              .cast(DoubleType)).as("kappa"))
  }

  private val q207Sql =
    """WITH x AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |conf AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS o
      |  FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |r AS (SELECT from_type AS k, CAST(sum(o) AS BIGINT) AS r FROM conf GROUP BY 1),
      |c AS (SELECT to_type AS k, CAST(sum(o) AS BIGINT) AS c FROM conf GROUP BY 1),
      |m AS (SELECT CAST(sum(CAST(coalesce(r.r, 0) AS HUGEINT) * coalesce(c.c, 0)) AS HUGEINT) AS src
      |  FROM r FULL OUTER JOIN c USING (k)),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n_pairs,
      |    CAST(sum(CASE WHEN from_type = to_type THEN o ELSE 0 END) AS BIGINT) AS sum_diag
      |  FROM conf)
      |SELECT t.n_pairs, t.sum_diag, CAST(m.src AS VARCHAR) AS sum_rc,
      |  CASE WHEN CAST(t.n_pairs AS HUGEINT) * t.n_pairs - m.src <> 0 THEN
      |    CAST(CAST(t.n_pairs AS HUGEINT) * t.sum_diag - m.src AS DOUBLE) /
      |    CAST(CAST(t.n_pairs AS HUGEINT) * t.n_pairs - m.src AS DOUBLE)
      |  END AS kappa
      |FROM t CROSS JOIN m""".stripMargin

  // ---------- purged / embargoed temporal split census (q208)
  /** The leakage-free TEMPORAL eval split — the time-series complement
    * of q133's entity-level leak-free split and q106's random one: test
    * = the trailing 30 days, train = everything strictly older, and an
    * EMBARGO gap of 7 days between them is assigned to neither — the
    * purge that stops look-ahead leakage when features aggregate over
    * trailing windows (a train row 1 day before the test boundary
    * carries a 5-order window that overlaps test-period state, q200's
    * exact feature shape). Cutoffs derive from the corpus max date in
    * INTEGER days, so membership is exact; the census pins each
    * split's count, date range, cents mass and customer checksum.
    *
    * Scale shape: one 1-row bounds aggregate broadcast into a
    * map-side-combinable 3-group census — two narrow passes, no
    * shuffle of the fact table. */
  private def q208(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast(DateType).as("dt"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
    val bounds = o.agg(max(col("dt")).as("dmax"))
    o.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col("dt") >= date_sub(col("dmax"), 30), "test")
          .when(col("dt") >= date_sub(col("dmax"), 37), "embargo")
          .otherwise("train"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"),
        min(col("dt")).cast(StringType).as("d_lo"),
        max(col("dt")).cast(StringType).as("d_hi"),
        sum(col("cents")).as("cents"),
        sum(col("o_custkey")).as("cust_sum"))
      .sortedOut("split")
  }

  private val q208Sql =
    """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |b AS (SELECT max(dt) AS dmax FROM o)
      |SELECT CASE WHEN dt >= dmax - 30 THEN 'test'
      |            WHEN dt >= dmax - 37 THEN 'embargo'
      |            ELSE 'train' END AS split,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(dt) AS VARCHAR) AS d_lo,
      |  CAST(max(dt) AS VARCHAR) AS d_hi,
      |  CAST(sum(cents) AS BIGINT) AS cents,
      |  CAST(sum(o_custkey) AS BIGINT) AS cust_sum
      |FROM o CROSS JOIN b GROUP BY 1 ORDER BY split""".stripMargin

  // ---------- gaps-and-islands: longest monthly order streak (q209)
  /** The sequential-pattern census: each customer's longest run of
    * CONSECUTIVE calendar months with at least one order — the
    * gaps-and-islands operator (island id = month-index − dense rank,
    * constant exactly while months are consecutive) that powers
    * retention streaks, subscription-lapse detection and "active N
    * months in a row" cohorts, where q109's cohort matrix only sees
    * each month independently. Month index `12·year + month` is pure
    * integer arithmetic; the histogram pins how many customers peak at
    * each streak length with a checksum of WHO.
    *
    * Scale shape: distinct (customer, month) collapses the fact table
    * first (map-side combinable); both windows ride ONE customer-keyed
    * shuffle (same-key windows share the partitioning); the histogram
    * is a ≤|months| rollup. */
  private def q209(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wm = Window.partitionBy("c").orderBy("m")
    val months = t(s, d, "orders")
      .select(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast(LongType).as("m"))
      .distinct()
    val streaks = months
      .withColumn("island", col("m") - row_number().over(wm))
      .groupBy("c", "island").agg(count(lit(1)).as("len"))
      .groupBy("c").agg(max(col("len")).as("max_streak"))
    streaks.groupBy("max_streak")
      .agg(count(lit(1)).as("n_customers"), sum(col("c")).as("cust_sum"))
      .sortedOut("max_streak")
  }

  private val q209Sql =
    """WITH months AS (SELECT DISTINCT o_custkey AS c,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
      |  FROM orders),
      |isl AS (SELECT c, m,
      |    m - row_number() OVER (PARTITION BY c ORDER BY m) AS island
      |  FROM months),
      |st AS (SELECT c, CAST(count(*) AS BIGINT) AS len
      |  FROM isl GROUP BY c, island),
      |mx AS (SELECT c, max(len) AS max_streak FROM st GROUP BY c)
      |SELECT max_streak, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(c) AS BIGINT) AS cust_sum
      |FROM mx GROUP BY 1 ORDER BY max_streak""".stripMargin

  // ---------------- exact weighted median per group (q210)
  /** The robust-statistics member the percentile family lacks: the
    * quantity-weighted median price per return flag — "the price at
    * which half the shipped UNITS are cheaper", which is the robust
    * location estimate when rows fan out to different volumes (q41's
    * unweighted percentile answers a different question the moment
    * weights vary). Lower weighted median: the smallest value v with
    * 2·cumweight(≤v) ≥ W — pure LONG comparisons on cents and integral
    * quantities, no interpolation, so the answer is a VALUE FROM THE
    * DATA and exact on both engines.
    *
    * Scale shape: one map-side-combinable (flag, cents) collapse
    * bounds the windowed frame by the distinct-value count, not the
    * row count; the per-flag running sum then funnels each flag's
    * distinct values through one task — fine while the value domain is
    * bounded (cents here), and the documented 100 TB form for an
    * unbounded domain is the [[RelationalOps.globalRowNumber]]
    * range-partition + prefix-offset pass (the q41-style exact twin of
    * `approx_percentile`'s mergeable sketch). */
  private def q210(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = t(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast(LongType).as("cents"),
        round(col("l_quantity")).cast(LongType).as("qty"))
      .groupBy("flag", "cents").agg(sum(col("qty")).as("w"))
    val wc = Window.partitionBy("flag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("flag")
    g.withColumn("cum", sum(col("w")).over(wc))
      .withColumn("wtot", sum(col("w")).over(wt))
      .withColumn("ndv", count(lit(1)).over(wt))
      .where(col("cum") * 2 >= col("wtot"))
      .groupBy("flag")
      .agg(min(col("cents")).as("wmedian_cents"),
        max(col("wtot")).as("w_total"), max(col("ndv")).as("n_distinct"))
      .sortedOut("flag")
  }

  private val q210Sql =
    """WITH g AS (SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, cents, w,
      |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS wtot,
      |    count(*) OVER (PARTITION BY flag) AS ndv
      |  FROM g)
      |SELECT flag, CAST(min(cents) AS BIGINT) AS wmedian_cents,
      |  CAST(max(wtot) AS BIGINT) AS w_total,
      |  CAST(max(ndv) AS BIGINT) AS n_distinct
      |FROM c WHERE cum * 2 >= wtot GROUP BY flag ORDER BY flag""".stripMargin

  // ------------- survival / life table: time to second order (q211)
  /** Survival analysis' sufficient statistics for the churn question
    * "how long until a first-time customer returns": per distinct
    * waiting time t (days between a customer's first and second
    * DISTINCT order dates), the at-risk count n(t) = #{T ≥ t}, event
    * count d(t) and right-censored count c(t) (no second order by the
    * corpus max date — dropping those rows entirely would bias the
    * curve optimistic, the mistake this operator exists to prevent).
    * Everything is integer day arithmetic, so the table — from which
    * Kaplan–Meier S(t) = Π(1 − d/n) follows by one ordered fold the
    * consumer applies — exact-matches; the fold itself is NOT emitted
    * because fp product order would make it engine-dependent.
    *
    * Scale shape: distinct (customer, date) collapse, one
    * customer-keyed shuffle for the first-two-dates window, then the
    * life table lives on ≤|day-domain| rows where the reverse
    * cumulative at-risk window is domain-bounded (the q204
    * argument). */
  private def q211(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("c").orderBy("dt")
    val dates = t(s, d, "orders")
      .select(col("o_custkey").as("c"), col("o_orderdate").cast(DateType).as("dt"))
      .distinct()
    val firstTwo = dates
      .withColumn("rn", row_number().over(wd)).where(col("rn") <= 2)
      .groupBy("c")
      .agg(max(when(col("rn") === 1, col("dt"))).as("d1"),
        max(when(col("rn") === 2, col("dt"))).as("d2"))
    val dmax = dates.agg(max(col("dt")).as("dmax"))
    val obs = firstTwo.crossJoin(broadcast(dmax))
      .select(
        when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
          .otherwise(datediff(col("dmax"), col("d1")))
          .cast(LongType).as("t_days"),
        when(col("d2").isNotNull, 1L).otherwise(0L).as("event"))
    val g = obs.groupBy("t_days")
      .agg(sum(col("event")).as("d_events"),
        sum(lit(1L) - col("event")).as("c_censored"),
        count(lit(1)).as("removed"))
    // reverse cumulative at-risk via the distributed prefix scan (the
    // unpartitioned desc-order window was the single-partition cliff)
    RelationalOps.globalRunningSum(g, Seq(col("t_days").desc),
        "removed", "n_at_risk")
      .select("t_days", "n_at_risk", "d_events", "c_censored")
      .sortedOut("t_days")
  }

  private val q211Sql =
    """WITH dates AS (SELECT DISTINCT o_custkey AS c, CAST(o_orderdate AS DATE) AS dt FROM orders),
      |ft AS (SELECT c,
      |    max(CASE WHEN rn = 1 THEN dt END) AS d1,
      |    max(CASE WHEN rn = 2 THEN dt END) AS d2
      |  FROM (SELECT c, dt, row_number() OVER (PARTITION BY c ORDER BY dt) AS rn
      |        FROM dates) WHERE rn <= 2 GROUP BY c),
      |b AS (SELECT max(dt) AS dmax FROM dates),
      |obs AS (SELECT
      |    CAST(CASE WHEN d2 IS NOT NULL THEN d2 - d1 ELSE dmax - d1 END AS BIGINT) AS t_days,
      |    CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event
      |  FROM ft CROSS JOIN b),
      |g AS (SELECT t_days, CAST(sum(event) AS BIGINT) AS d_events,
      |    CAST(sum(1 - event) AS BIGINT) AS c_censored,
      |    CAST(count(*) AS BIGINT) AS removed
      |  FROM obs GROUP BY t_days)
      |SELECT t_days,
      |  CAST(sum(removed) OVER (ORDER BY t_days DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_risk,
      |  d_events, c_censored
      |FROM g ORDER BY t_days""".stripMargin

  // ------- per-source language-mix drift: total variation (q212)
  /** How far does each feed's language mix sit from the corpus-wide
    * mix? Total variation distance — ½·Σ|p(lang|source) − p(lang)| —
    * is the ppm-exact member of the divergence family (KL/JS need
    * data-dependent logs, which no hash oracle survives): the maximum
    * probability mass any event (here: language-set) can disagree by,
    * so `tvd_ppm = 150000` reads directly as "15% of this feed's docs
    * are language-misallocated vs the corpus profile". Shares are
    * integer parts-per-million (identical floor division both
    * engines), absolute differences sum per source over the languages
    * the source OR the corpus has (full outer on the lang axis — a
    * language the source lacks still contributes its corpus share).
    *
    * Scale shape: one (source, lang) map-side count; everything after
    * runs on ≤|S|·|L| rows. The always-cheap drift screen beside
    * q149's windowed anomaly alarm and q121's corpus diff. */
  private def q212(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("o"))
    val bySrc = cells.groupBy("source").agg(sum(col("o")).as("ns"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val byLang = cells.groupBy("lang").agg(sum(col("o")).as("nl"))
      .crossJoin(broadcast(tot))
      .withColumn("p_all_ppm", expr("nl * 1000000 div n"))
    // Σ over ALL langs of the corpus ppm share — the absent-lang arm's
    // total. The naive |S|×|L| grid (crossJoin + left join) is a
    // BroadcastNestedLoopJoin (planLint finding); this algebraic split
    // — present langs contribute |p_s − p_l|, absent langs contribute
    // exactly p_l, so their sum is P_all − Σ_present p_l — computes the
    // identical integers with only broadcast-hash equi-joins.
    val pAll = byLang.agg(sum(col("p_all_ppm")).as("p_all_sum"))
    cells.join(broadcast(bySrc), Seq("source"))
      .join(broadcast(byLang.select("lang", "p_all_ppm")), Seq("lang"))
      .withColumn("p_src_ppm", expr("o * 1000000 div ns"))
      .groupBy("source")
      .agg(max(col("ns")).as("n_docs"),
        sum(abs(col("p_src_ppm") - col("p_all_ppm"))).as("present_abs"),
        sum(col("p_all_ppm")).as("present_all"))
      .crossJoin(broadcast(pAll))
      .withColumn("tvd_ppm",
        expr("(present_abs + p_all_sum - present_all) div 2"))
      .select("source", "n_docs", "tvd_ppm")
      .sortedOut("source")
  }

  private val q212Sql =
    """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |s AS (SELECT source, CAST(sum(o) AS BIGINT) AS ns FROM cells GROUP BY 1),
      |l AS (SELECT lang, CAST(sum(o) AS BIGINT) AS nl FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |x AS (SELECT s.source, l.lang, s.ns, l.nl, t.n,
      |    coalesce(cells.o, 0) AS o
      |  FROM s CROSS JOIN l
      |  LEFT JOIN cells ON cells.source = s.source AND cells.lang = l.lang
      |  CROSS JOIN t)
      |SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
      |  CAST(sum(abs(o * 1000000 // ns - nl * 1000000 // n)) // 2 AS BIGINT) AS tvd_ppm
      |FROM x GROUP BY source ORDER BY source""".stripMargin

  // ------- two-sample Kolmogorov–Smirnov drift per source (q213)
  /** The distribution-shape member of the drift family: for each
    * source, the two-sample KS statistic D = sup|F_src − F_corpus|
    * over the doc-length distribution — the alarm that fires when a
    * feed's SHAPE changes (bimodal split, truncation) even though its
    * mean and language mix (q212's TVD on a categorical axis) look
    * fine. D is computed EXACTLY: with both ECDFs step functions
    * jumping only at corpus-distinct lengths, and F_src constant
    * between a source's own jump points while F_all is monotone there,
    * sup|F_src − F_all| is attained at one of the two endpoints of
    * each own-jump gap — so per own length v the candidates are AT v
    * (cum_src·N − cum_all·n) and JUST BEFORE v (both cums backed off
    * by their jump), cleared of denominators into DECIMAL(38,0)
    * integers. The max numerator is exported as canonical digits plus
    * a floor-division ppm — no fp anywhere.
    *
    * Scale shape: one (source, length) map-side count; the corpus
    * ECDF's unpartitioned running sum spans one row per DISTINCT
    * length — domain-bounded, the q204/q210 argument — and the
    * per-source running sum rides a source-keyed window. Everything
    * downstream of the first count is ≤|S|·|L| rows with
    * broadcast-only joins. */
  private def q213(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val cells = Tables.documents(s, d)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val byV = RelationalOps.globalRunningSum(
      cells.groupBy("v").agg(sum(col("c")).as("cnt_all")),
      Seq(col("v").asc), "cnt_all", "cum_all")
    val bySrc = cells.groupBy("source").agg(sum(col("c")).as("n_src"))
    val tot = cells.agg(sum(col("c")).as("n_all"))
    val ws = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .join(broadcast(byV), Seq("v"))
      .withColumn("cum_src", sum(col("c")).over(ws))
      .join(broadcast(bySrc), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("d_at", abs(dec(col("cum_src")) * dec(col("n_all")) -
        dec(col("cum_all")) * dec(col("n_src"))))
      .withColumn("d_gap", abs(dec(col("cum_src") - col("c")) * dec(col("n_all")) -
        dec(col("cum_all") - col("cnt_all")) * dec(col("n_src"))))
      .groupBy("source")
      .agg(max(col("n_src")).as("n_src"), max(col("n_all")).as("n_all"),
        max(greatest(col("d_at"), col("d_gap"))).as("ksn"))
      .select(col("source"), col("n_src"), col("n_all"),
        col("ksn").cast(StringType).as("ks_num"),
        expr("CAST(ksn * 1000000 div (CAST(n_src AS DECIMAL(38,0)) * n_all) AS BIGINT)")
          .as("ks_ppm"))
      .sortedOut("source")
  }

  private val q213Sql =
    """WITH cells AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |bv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt_all FROM cells GROUP BY 1),
      |bvc AS (SELECT v, cnt_all, CAST(sum(cnt_all) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all FROM bv),
      |bs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM cells),
      |j AS (SELECT cells.source, cells.c, bvc.cnt_all, bvc.cum_all, bs.n_src, t.n_all,
      |    CAST(sum(cells.c) OVER (PARTITION BY cells.source ORDER BY cells.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_src
      |  FROM cells JOIN bvc USING (v) JOIN bs USING (source) CROSS JOIN t),
      |k AS (SELECT source, n_src, n_all, greatest(
      |    abs(CAST(cum_src AS HUGEINT) * n_all - CAST(cum_all AS HUGEINT) * n_src),
      |    abs(CAST(cum_src - c AS HUGEINT) * n_all - CAST(cum_all - cnt_all AS HUGEINT) * n_src)) AS dm
      |  FROM j)
      |SELECT source, CAST(max(n_src) AS BIGINT) AS n_src,
      |  CAST(max(n_all) AS BIGINT) AS n_all,
      |  CAST(max(dm) AS VARCHAR) AS ks_num,
      |  CAST(max(dm) * 1000000 // (CAST(max(n_src) AS HUGEINT) * max(n_all)) AS BIGINT) AS ks_ppm
      |FROM k GROUP BY source ORDER BY source""".stripMargin

  // ------- Mann–Whitney rank-sum drift per source (q214)
  /** The rank-based LOCATION drift alarm beside q213's shape alarm:
    * for each source, the Mann–Whitney U of its doc lengths against
    * the REST of the corpus — "do this feed's docs run systematically
    * longer?" — robust where a mean-shift test is wrecked by the heavy
    * tail. Ranks over the combined sample collapse to per-distinct-
    * value arithmetic: a value v with corpus count t and c_before
    * smaller elements carries doubled average rank 2·c_before + t + 1
    * (doubling keeps tie-averaged half-ranks INTEGER, the q174
    * min+max trick in closed form), so the source's doubled rank sum
    * is one broadcast-join aggregate, and 2U = 2R − n(n+1) is exact
    * DECIMAL(38,0). The common-language effect size
    * AUC = P(src > rest) + ½P(=) = 2U / (2·n·m) is the single IEEE
    * division at the end (q203 policy).
    *
    * Scale shape: identical to q213 — one map-side (source, length)
    * count, a domain-bounded corpus ECDF, broadcast joins, and a
    * per-source fold; no corpus-sized shuffle after the first
    * aggregate. */
  private def q214(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val cells = Tables.documents(s, d)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val byV = RelationalOps.globalRunningSum(
        cells.groupBy("v").agg(sum(col("c")).as("cnt_all")),
        Seq(col("v").asc), "cnt_all", "cum_before", inclusive = false)
      .withColumn("cum_before", coalesce(col("cum_before"), lit(0L)))
    val tot = cells.agg(sum(col("c")).as("n_all"))
    cells
      .join(broadcast(byV), Seq("v"))
      .withColumn("r2c", dec(col("c")) *
        dec(lit(2L) * col("cum_before") + col("cnt_all") + lit(1L)))
      .groupBy("source")
      .agg(sum(col("c")).as("n_src"),
        sum(col("r2c")).cast(DecimalType(38, 0)).as("r2"))
      .crossJoin(broadcast(tot))
      .withColumn("n_rest", col("n_all") - col("n_src"))
      .withColumn("u2", (col("r2") -
        dec(col("n_src")) * dec(col("n_src") + lit(1L)))
        .cast(DecimalType(38, 0)))
      .select(col("source"), col("n_src"), col("n_rest"),
        col("r2").cast(StringType).as("rank2_sum"),
        col("u2").cast(StringType).as("u2"),
        when(col("n_rest") > 0,
          col("u2").cast(DoubleType) /
            (lit(2.0) * col("n_src") * col("n_rest"))).as("auc"))
      .sortedOut("source")
  }

  private val q214Sql =
    """WITH cells AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |bv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt_all,
      |    CAST(coalesce(sum(sum(c)) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |  FROM cells GROUP BY v),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM cells),
      |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src,
      |    CAST(sum(CAST(c AS HUGEINT) * (2 * cum_before + cnt_all + 1)) AS HUGEINT) AS r2
      |  FROM cells JOIN bv USING (v) GROUP BY source)
      |SELECT source, n_src, n_all - n_src AS n_rest,
      |  CAST(r2 AS VARCHAR) AS rank2_sum,
      |  CAST(r2 - CAST(n_src AS HUGEINT) * (n_src + 1) AS VARCHAR) AS u2,
      |  CASE WHEN n_all - n_src > 0 THEN
      |    CAST(r2 - CAST(n_src AS HUGEINT) * (n_src + 1) AS DOUBLE) /
      |    (2.0 * n_src * (n_all - n_src)) END AS auc
      |FROM g CROSS JOIN t ORDER BY source""".stripMargin

  // ------- Kendall tau-b: do two corpus signals agree? (q215)
  /** The ordinal-agreement member beside q174's Spearman: across
    * sources, do total character mass (x) and language diversity (y,
    * distinct langs) RANK the feeds the same way? Tau-b counts
    * concordant/discordant pairs with explicit tie corrections —
    * the right statistic when y is a small integer full of ties,
    * where Spearman's midranks blur. All pair counts are exact
    * integers; tau_b = (nc − nd)/√((n0−n1)(n0−n2)) is one IEEE
    * sqrt + division over them (q203 policy — √ is correctly
    * rounded, so bit-portable).
    *
    * The |S|² pair generation is a BroadcastNestedLoopJoin whose
    * build side goes through [[RelationalOps.boundedRegistry]]: the
    * source axis is a bounded registry (tens of feeds), the plan-level
    * limit makes that bound STATIC so planLint's bounded-cohort proof
    * applies, and a registry past 4096 sources FAILS LOUDLY instead of
    * silently truncating (wave-12 contract) — the corpus-sized side
    * never enters the loop (the bruteForceTopK pattern; a literal-key
    * equi-join does NOT work here because Catalyst constant-folds the
    * key away and degrades it to the same BNLJ without the bound).
    *
    * Scale shape: signals are one map-side aggregate (countDistinct
    * lang is |S|·|L|-bounded); pairs run over |S|² rows of a
    * broadcast join — the statistic lives entirely on the reduced
    * signal table, never the corpus. */
  private def q215(s: SparkSession, d: String): DataFrame = {
    val sig = Tables.documents(s, d)
      .groupBy("source")
      .agg(sum(col("n_chars")).as("x"),
        countDistinct(col("lang")).as("y"))
    val a = sig.select(col("source").as("sa"),
      col("x").as("xa"), col("y").as("ya"))
    val b = RelationalOps.boundedRegistry(
      sig.select(col("source").as("sb"),
        col("x").as("xb"), col("y").as("yb")), 4096, "q215 source registry")
    val pairs = a.crossJoin(broadcast(b)).where(col("sa") < col("sb"))
      .withColumn("prod",
        signum(col("xa") - col("xb")) * signum(col("ya") - col("yb")))
    val m = pairs.agg(
      count(lit(1)).as("n0"),
      sum(when(col("prod") > 0, 1L).otherwise(0L)).as("nc"),
      sum(when(col("prod") < 0, 1L).otherwise(0L)).as("nd"),
      sum(when(col("xa") === col("xb"), 1L).otherwise(0L)).as("tied_x"),
      sum(when(col("ya") === col("yb"), 1L).otherwise(0L)).as("tied_y"))
    m.crossJoin(broadcast(sig.agg(count(lit(1)).as("n_sources"))))
      .select(col("n_sources"), col("n0"), col("nc"), col("nd"),
        col("tied_x"), col("tied_y"),
        when((col("n0") - col("tied_x")) * (col("n0") - col("tied_y")) > 0,
          (col("nc") - col("nd")).cast(DoubleType) /
            sqrt(((col("n0") - col("tied_x")) *
              (col("n0") - col("tied_y"))).cast(DoubleType))).as("tau_b"))
  }

  private val q215Sql =
    """WITH sig AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS y
      |  FROM documents GROUP BY source),
      |p AS (SELECT sign(a.x - b.x) * sign(a.y - b.y) AS prod,
      |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
      |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      |  FROM sig a JOIN sig b ON a.source < b.source),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
      |    CAST(sum(tx) AS BIGINT) AS tied_x, CAST(sum(ty) AS BIGINT) AS tied_y
      |  FROM p),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM sig)
      |SELECT n_sources, n0, nc, nd, tied_x, tied_y,
      |  CASE WHEN (n0 - tied_x) * (n0 - tied_y) > 0 THEN
      |    CAST(nc - nd AS DOUBLE) /
      |    sqrt(CAST((n0 - tied_x) * (n0 - tied_y) AS DOUBLE)) END AS tau_b
      |FROM m CROSS JOIN s""".stripMargin

  // ------- monthly top-k heavy hitters with rank drift (q216)
  /** The heavy-hitter DRIFT census: each month's top-5 parts by
    * shipped units, annotated with the part's rank and volume in the
    * PREVIOUS month — the "what changed in this batch's head" report
    * a corpus curator reads before trusting a new crawl snapshot
    * (q121's corpus diff for the frequency head, made temporal).
    * A newly-hot part carries NULL prev columns; rank ties break on
    * part key so the cut is deterministic on both engines.
    *
    * Scale shape: one map-side (month, part) rollup off the fact
    * table, a per-month window for ranks, and a self equi-join on
    * (month+1, part) — all keyed shuffles on the AGGREGATE, whose
    * size is months × live parts, not the fact table. */
  private def q216(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = t(s, d, "lineitem")
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast(LongType).as("m"),
        col("l_partkey").cast(LongType).as("part"),
        round(col("l_quantity")).cast(LongType).as("qty"))
      .groupBy("m", "part").agg(sum(col("qty")).as("units"))
    val ranked = m.withColumn("rnk", row_number().over(
        Window.partitionBy("m").orderBy(col("units").desc, col("part").asc))
      .cast(LongType))
    val prev = ranked.select((col("m") + 1).as("m"), col("part"),
      col("rnk").as("prev_rnk"), col("units").as("prev_units"))
    ranked.where(col("rnk") <= 5)
      .join(prev, Seq("m", "part"), "left_outer")
      .select("m", "rnk", "part", "units", "prev_rnk", "prev_units")
      .sortedOutWide("m", "rnk")
  }

  private val q216Sql =
    """WITH g AS (SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS m,
      |    l_partkey AS part, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS units
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT m, part, units, CAST(row_number() OVER (PARTITION BY m
      |    ORDER BY units DESC, part ASC) AS BIGINT) AS rnk FROM g)
      |SELECT a.m, a.rnk, a.part, a.units, b.rnk AS prev_rnk, b.units AS prev_units
      |FROM r a LEFT JOIN r b ON b.m + 1 = a.m AND b.part = a.part
      |WHERE a.rnk <= 5 ORDER BY a.m, a.rnk""".stripMargin

  // ------- Luhn checksum audit over fixed-width keys (q217)
  /** The checksum-validity census — the kernel behind payment-card
    * PII detection in corpus scrubbing (a digit run that PASSES Luhn
    * is the signal that turns "16 digits" into "probable card
    * number"): each order key, zero-padded to a fixed 12-digit
    * account-number shape, is Luhn-checked with the classic
    * double-every-second-from-the-right rule. The mod-10 sum unrolls
    * into 12 codegen-friendly terms (no HOF, no UDF — the interpreted
    * `aggregate()` lambda planLint would flag); the census per order
    * status pins the valid count, the full checksum mass, and WHICH
    * keys validate via a key checksum.
    *
    * Scale shape: embarrassingly parallel scan + map-side-combinable
    * rollup to |status| rows; no shuffle of anything data-sized. */
  private def q217(s: SparkSession, d: String): DataFrame = {
    val p = lpad(col("o_orderkey").cast(StringType), 12, "0")
    val lsum = (1 to 12).map { i =>
      val dgt = substring(p, i, 1).cast(LongType)
      if ((12 - i) % 2 == 1) when(dgt * 2 > 9, dgt * 2 - 9).otherwise(dgt * 2)
      else dgt
    }.reduce(_ + _)
    t(s, d, "orders")
      .select(col("o_orderstatus").as("status"), col("o_orderkey"),
        lsum.as("lsum"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("lsum") % 10 === 0, 1L).otherwise(0L)).as("n_luhn_valid"),
        sum(col("lsum")).as("luhn_mass"),
        sum(when(col("lsum") % 10 === 0, col("o_orderkey")).otherwise(0L))
          .as("valid_key_sum"))
      .sortedOut("status")
  }

  private val q217Sql = {
    val terms = (1 to 12).map { i =>
      val d = s"CAST(substr(p, $i, 1) AS BIGINT)"
      if ((12 - i) % 2 == 1)
        s"(CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END)"
      else d
    }.mkString(" + ")
    s"""WITH x AS (SELECT o_orderstatus AS status, o_orderkey,
       |    lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS p FROM orders),
       |l AS (SELECT status, o_orderkey, $terms AS lsum FROM x)
       |SELECT status, CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(sum(CASE WHEN lsum % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_valid,
       |  CAST(sum(lsum) AS BIGINT) AS luhn_mass,
       |  CAST(sum(CASE WHEN lsum % 10 = 0 THEN o_orderkey ELSE 0 END) AS BIGINT) AS valid_key_sum
       |FROM l GROUP BY status ORDER BY status""".stripMargin
  }

  // ------- CUSUM changepoint scan over daily event volume (q218)
  /** WHERE did each event stream's level shift? The cumulative-sum
    * changepoint statistic: with daily counts c₁…c_n, the day k
    * maximizing |S_k| = |n·Σ₁ᵏc − k·Σ₁ⁿc| (the textbook
    * CUSUM-from-the-mean with denominators cleared — n·mean stays
    * INTEGER) is the single most likely level-shift point, the
    * statistic behind "the crawler's feed changed on the 14th"
    * retrospectives. q149's windowed anomaly alarm asks "is today
    * weird"; this asks "where is the regime boundary" over the whole
    * history. Ties on |S| break to the earliest day.
    *
    * Scale shape: one map-side (type, day) rollup; every window —
    * running sum, row number, totals, the argmax pick — rides ONE
    * type-keyed shuffle over ≤|T|·|days| rows (same-key windows share
    * the partitioning), domain-bounded like q204/q210. */
  private def q218(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
    val wo = Window.partitionBy("et").orderBy("day")
    val wt = Window.partitionBy("et")
    daily
      .withColumn("k", row_number().over(wo))
      .withColumn("cum", sum(col("c")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nd", count(lit(1)).over(wt))
      .withColumn("tot", sum(col("c")).over(wt))
      .withColumn("s_k", col("nd") * col("cum") - col("k") * col("tot"))
      .withColumn("pick", row_number().over(
        Window.partitionBy("et").orderBy(abs(col("s_k")).desc, col("day").asc)))
      .where(col("pick") === 1)
      .select(col("et").as("event_type"), col("nd").as("n_days"),
        col("tot").as("total_events"), abs(col("s_k")).as("cusum_max"),
        col("day").cast(StringType).as("changepoint_day"))
      .sortedOut("event_type")
  }

  private val q218Sql =
    """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |w AS (SELECT et, day, c,
      |    CAST(row_number() OVER (PARTITION BY et ORDER BY day) AS BIGINT) AS k,
      |    CAST(sum(c) OVER (PARTITION BY et ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(count(*) OVER (PARTITION BY et) AS BIGINT) AS nd,
      |    CAST(sum(c) OVER (PARTITION BY et) AS BIGINT) AS tot
      |  FROM daily),
      |s AS (SELECT et, day, nd, tot, nd * cum - k * tot AS s_k,
      |    row_number() OVER (PARTITION BY et ORDER BY abs(nd * cum - k * tot) DESC, day ASC) AS pick
      |  FROM w)
      |SELECT et AS event_type, nd AS n_days, tot AS total_events,
      |  abs(s_k) AS cusum_max, CAST(day AS VARCHAR) AS changepoint_day
      |FROM s WHERE pick = 1 ORDER BY event_type""".stripMargin

  // ------- Wald–Wolfowitz runs test on daily volume (q219)
  /** Is each event stream's day-to-day volume RANDOM around its
    * median, or does it trend/oscillate? The runs test's sufficient
    * statistics: days flagged above (>) vs at-or-below the stream's
    * exact lower-median daily count, the observed count of
    * same-flag RUNS, and n₁/n₂ — against the null expectation
    * E[R] = 1 + 2n₁n₂/n (the single IEEE division at the end, q203
    * policy). Far fewer runs than expected = regime clustering (the
    * q218 changepoint's cheap screening sibling); far more =
    * oscillation (a load balancer flapping).
    *
    * Scale shape: the (type, day) rollup feeds a value-domain-bounded
    * median pass (q210's gate) and one type-keyed ordered window for
    * the lag; both ride the same |T|·|days|-row aggregate. */
  private def q219(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
    val med = daily.groupBy(col("et"), col("c").as("v"))
      .agg(count(lit(1)).as("f"))
      .withColumn("cumf", sum(col("f")).over(
        Window.partitionBy("et").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ndays", sum(col("f")).over(Window.partitionBy("et")))
      .where(col("cumf") * 2 >= col("ndays"))
      .groupBy("et").agg(min(col("v")).as("med"))
    daily.join(broadcast(med), Seq("et"))
      .withColumn("flag", (col("c") > col("med")).cast(LongType))
      .withColumn("prev", lag(col("flag"), 1).over(
        Window.partitionBy("et").orderBy("day")))
      .groupBy("et")
      .agg(count(lit(1)).as("n_days"), max(col("med")).as("median_daily"),
        sum(col("flag")).as("n_above"),
        (sum(when(col("prev").isNotNull && col("prev") =!= col("flag"), 1L)
          .otherwise(0L)) + 1L).as("n_runs"))
      .withColumn("n_below", col("n_days") - col("n_above"))
      .withColumn("expected_runs",
        when(col("n_days") > 0, lit(1.0) +
          (lit(2.0) * col("n_above") * col("n_below")) /
            col("n_days").cast(DoubleType)))
      .select("et", "n_days", "median_daily", "n_above", "n_below",
        "n_runs", "expected_runs")
      .withColumnRenamed("et", "event_type")
      .sortedOut("event_type")
  }

  private val q219Sql =
    """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |byv AS (SELECT et, c AS v, CAST(count(*) AS BIGINT) AS f FROM daily GROUP BY 1, 2),
      |cm AS (SELECT et, v,
      |    CAST(sum(f) OVER (PARTITION BY et ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumf,
      |    CAST(sum(f) OVER (PARTITION BY et) AS BIGINT) AS ndays
      |  FROM byv),
      |med AS (SELECT et, CAST(min(v) AS BIGINT) AS med FROM cm
      |  WHERE cumf * 2 >= ndays GROUP BY et),
      |fl AS (SELECT daily.et, day, med,
      |    CASE WHEN c > med THEN 1 ELSE 0 END AS flag,
      |    lag(CASE WHEN c > med THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY daily.et ORDER BY day) AS prev
      |  FROM daily JOIN med USING (et)),
      |g AS (SELECT et, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(max(med) AS BIGINT) AS median_daily,
      |    CAST(sum(flag) AS BIGINT) AS n_above,
      |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> flag THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
      |  FROM fl GROUP BY et)
      |SELECT et AS event_type, n_days, median_daily, n_above,
      |  n_days - n_above AS n_below, n_runs,
      |  CASE WHEN n_days > 0 THEN 1.0 + (2.0 * n_above * (n_days - n_above)) / n_days END AS expected_runs
      |FROM g ORDER BY event_type""".stripMargin

  // ------- importance weights to uniform mix + ESS (q220)
  /** The mixture-reweighting operator: per-doc importance weights
    * that would rebalance the corpus to a UNIFORM share per source
    * (w_s = N/(S·n_s), in exact ppm), and the effective sample size
    * (Σw)²/Σw² those weights would leave — the number that says
    * "reweighting this skewed corpus to uniform costs you X% of your
    * data" BEFORE anyone trains on it. q127's temperature mix picks
    * sampling fractions; this prices the weighted-loss alternative.
    * All sums are DECIMAL(38,0) over integer ppm weights, so ESS
    * num/den export as canonical digits; the ESS itself and its
    * share of N are the final divisions (q203 policy).
    *
    * Scale shape: one map-side source census; everything else is
    * |S|-row arithmetic behind broadcasts. */
  private def q220(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val bySrc = Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = bySrc.agg(sum(col("n_docs")).as("n_all"),
      count(lit(1)).as("n_sources"))
    val w = bySrc.crossJoin(broadcast(tot))
      .withColumn("weight_ppm",
        expr("n_all * 1000000 div (n_sources * n_docs)"))
      .withColumn("mass", dec(col("n_docs")) * dec(col("weight_ppm")))
    val ess = w.agg(
      sum(col("mass")).cast(DecimalType(38, 0)).as("sw"),
      sum(col("mass") * dec(col("weight_ppm"))).cast(DecimalType(38, 0))
        .as("sw2"))
    w.crossJoin(broadcast(ess))
      .withColumn("ess_num", (col("sw") * col("sw")).cast(DecimalType(38, 0)))
      .select(col("source"), col("n_docs"), col("weight_ppm"),
        col("mass").cast(StringType).as("mass"),
        col("ess_num").cast(StringType).as("ess_num"),
        col("sw2").cast(StringType).as("ess_den"),
        (col("ess_num").cast(DoubleType) / col("sw2").cast(DoubleType))
          .as("ess"),
        expr("CAST(ess_num * 1000000 div (sw2 * n_all) AS BIGINT)")
          .as("ess_share_ppm"))
      .sortedOut("source")
  }

  private val q220Sql =
    """WITH b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
      |    CAST(count(*) AS BIGINT) AS n_sources FROM b),
      |w AS (SELECT source, n_docs,
      |    CAST(n_all * 1000000 // (n_sources * n_docs) AS BIGINT) AS weight_ppm,
      |    n_all FROM b CROSS JOIN t),
      |m AS (SELECT source, n_docs, weight_ppm, n_all,
      |    CAST(n_docs AS HUGEINT) * weight_ppm AS mass FROM w),
      |e AS (SELECT CAST(sum(mass) AS HUGEINT) AS sw,
      |    CAST(sum(mass * weight_ppm) AS HUGEINT) AS sw2 FROM m)
      |SELECT source, n_docs, weight_ppm, CAST(mass AS VARCHAR) AS mass,
      |  CAST(sw * sw AS VARCHAR) AS ess_num,
      |  CAST(sw2 AS VARCHAR) AS ess_den,
      |  CAST(sw * sw AS DOUBLE) / CAST(sw2 AS DOUBLE) AS ess,
      |  CAST(sw * sw * 1000000 // (sw2 * n_all) AS BIGINT) AS ess_share_ppm
      |FROM m CROSS JOIN e ORDER BY source""".stripMargin

  // ------- per-group exact variance census + homogeneity (q221)
  /** The spread member of the data-card family (q198 stops at
    * min/max/NDV): per order priority, the EXACT sample variance of
    * order value via the cleared numerator n·Σx² − (Σx)² on LONG
    * cents — a DECIMAL(38,0) integer at any scale, order-independent
    * where a naive fp Welford fold is not — and the homogeneity
    * ratio max-variance/min-variance across groups (the
    * Levene-style screen for "is spend volatility itself
    * segment-dependent"). The per-group variance and mean are single
    * IEEE divisions from exact integers, so the cross-group max/min
    * — taken over those bit-identical doubles — is deterministic on
    * both engines.
    *
    * Scale shape: one map-side-combinable rollup to |G| rows; the
    * ratio attaches via a 1-row broadcast. */
  private def q221(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val g = t(s, d, "orders")
      .select(col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(dec(col("cents")) * dec(col("cents")))
          .cast(DecimalType(38, 0)).as("q"))
      .withColumn("var_num",
        (dec(col("n")) * col("q") - dec(col("s")) * dec(col("s")))
          .cast(DecimalType(38, 0)))
      .withColumn("var_den", col("n") * (col("n") - 1))
      .withColumn("variance", col("var_num").cast(DoubleType) /
        col("var_den").cast(DoubleType))
      .withColumn("mean_cents",
        col("s").cast(DoubleType) / col("n").cast(DoubleType))
    val span = g.agg(max(col("variance")).as("var_max"),
      min(col("variance")).as("var_min"))
    g.crossJoin(broadcast(span))
      .select(col("priority"), col("n"), col("s").as("sum_cents"),
        col("var_num").cast(StringType).as("var_num"), col("var_den"),
        col("mean_cents"), col("variance"),
        (col("var_max") / col("var_min")).as("homogeneity_ratio"))
      .sortedOut("priority")
  }

  private val q221Sql =
    """WITH g AS (SELECT o_orderpriority AS priority,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
      |    CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS q
      |  FROM orders GROUP BY 1),
      |v AS (SELECT priority, n, s,
      |    CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS var_num,
      |    n * (n - 1) AS var_den FROM g),
      |w AS (SELECT *, CAST(var_num AS DOUBLE) / CAST(var_den AS DOUBLE) AS variance,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents FROM v),
      |sp AS (SELECT max(variance) AS var_max, min(variance) AS var_min FROM w)
      |SELECT priority, n, s AS sum_cents, CAST(var_num AS VARCHAR) AS var_num,
      |  var_den, mean_cents, variance, var_max / var_min AS homogeneity_ratio
      |FROM w CROSS JOIN sp ORDER BY priority""".stripMargin

  // ------- lag-1 autocorrelation of daily volume (q222)
  /** Is each event stream's daily volume momentum-driven or
    * mean-reverting? Lag-1 autocorrelation with the mean cleared by
    * n: r₁ = Σ(n·x_k − T)(n·x_{k+1} − T) / Σ(n·x_k − T)² — numerator
    * over consecutive day pairs, denominator over all days, BOTH
    * exact DECIMAL(38,0) integers (n·mean = T stays integral), one
    * IEEE division at the end. Positive r₁ = trending feed (q218's
    * changepoint will find where); negative = oscillation (q219's
    * runs test agrees from the sign side); ≈0 = the i.i.d.-ish
    * stream a sampler can treat as exchangeable.
    *
    * Scale shape: the (type, day) rollup rides one type-keyed
    * shuffle for lead + totals (shared partitioning); the sums are
    * |T|-row folds. Consecutive CALENDAR days are not required —
    * the lag is over successive observed days, documented here. */
  private def q222(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val wo = Window.partitionBy("et").orderBy("day")
    val wt = Window.partitionBy("et")
    val daily = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
    daily
      .withColumn("nxt", lead(col("c"), 1).over(wo))
      .withColumn("nd", count(lit(1)).over(wt))
      .withColumn("tot", sum(col("c")).over(wt))
      .withColumn("dev", dec(col("nd") * col("c") - col("tot")))
      .withColumn("devn", dec(col("nd") * col("nxt") - col("tot")))
      .groupBy("et")
      .agg(max(col("nd")).as("n_days"), max(col("tot")).as("total_events"),
        sum(when(col("nxt").isNotNull, col("dev") * col("devn"))
          .otherwise(lit(0))).cast(DecimalType(38, 0)).as("r1_num"),
        sum(col("dev") * col("dev")).cast(DecimalType(38, 0)).as("r1_den"))
      .select(col("et").as("event_type"), col("n_days"), col("total_events"),
        col("r1_num").cast(StringType).as("r1_num"),
        col("r1_den").cast(StringType).as("r1_den"),
        when(col("r1_den") =!= 0, col("r1_num").cast(DoubleType) /
          col("r1_den").cast(DoubleType)).as("r1"))
      .sortedOut("event_type")
  }

  private val q222Sql =
    """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |w AS (SELECT et, day, c,
      |    lead(c) OVER (PARTITION BY et ORDER BY day) AS nxt,
      |    CAST(count(*) OVER (PARTITION BY et) AS BIGINT) AS nd,
      |    CAST(sum(c) OVER (PARTITION BY et) AS BIGINT) AS tot
      |  FROM daily),
      |dv AS (SELECT et, nd, tot,
      |    CAST(nd * c - tot AS HUGEINT) AS dev,
      |    CAST(nd * nxt - tot AS HUGEINT) AS devn,
      |    nxt IS NOT NULL AS has_next
      |  FROM w),
      |g AS (SELECT et, CAST(max(nd) AS BIGINT) AS n_days,
      |    CAST(max(tot) AS BIGINT) AS total_events,
      |    CAST(sum(CASE WHEN has_next THEN dev * devn ELSE 0 END) AS HUGEINT) AS r1_num,
      |    CAST(sum(dev * dev) AS HUGEINT) AS r1_den
      |  FROM dv GROUP BY et)
      |SELECT et AS event_type, n_days, total_events,
      |  CAST(r1_num AS VARCHAR) AS r1_num, CAST(r1_den AS VARCHAR) AS r1_den,
      |  CASE WHEN r1_den <> 0 THEN CAST(r1_num AS DOUBLE) / CAST(r1_den AS DOUBLE) END AS r1
      |FROM g ORDER BY event_type""".stripMargin

  // ------- Fano factor: burstiness census per stream (q223)
  /** Is a feed's daily volume Poisson-ish (Fano ≈ 1), regular
    * (< 1), or BURSTY (> 1 — batched uploads, crawler restarts,
    * syndication storms)? The variance-to-mean ratio with every
    * denominator cleared: F = n·(n·Σx² − T²) / ((n−1)·n·T) reduces
    * to num = n·Σx² − T² (the q221 variance numerator) and
    * den = (n−1)·T, both DECIMAL(38,0)-exact, one IEEE division.
    * The burstiness triad completes: q218 locates the shift, q219
    * tests randomness, q222 measures momentum, Fano measures
    * dispersion — four orthogonal answers from ONE shared
    * (type, day) rollup shape.
    *
    * Scale shape: map-side rollup to |T|·|days| rows, then a
    * |T|-row fold; no window at all — the cheapest of the four. */
  private def q223(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
      .groupBy("et")
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total_events"),
        sum(dec(col("c")) * dec(col("c"))).cast(DecimalType(38, 0)).as("q"))
      .withColumn("fano_num",
        (dec(col("n_days")) * col("q") -
          dec(col("total_events")) * dec(col("total_events")))
          .cast(DecimalType(38, 0)))
      .withColumn("fano_den",
        (dec(col("n_days") - 1) * dec(col("total_events")))
          .cast(DecimalType(38, 0)))
      .select(col("et").as("event_type"), col("n_days"), col("total_events"),
        col("fano_num").cast(StringType).as("fano_num"),
        col("fano_den").cast(StringType).as("fano_den"),
        when(col("fano_den") =!= 0, col("fano_num").cast(DoubleType) /
          col("fano_den").cast(DoubleType)).as("fano"))
      .sortedOut("event_type")
  }

  private val q223Sql =
    """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |g AS (SELECT et, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(c) AS BIGINT) AS total_events,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
      |  FROM daily GROUP BY et),
      |f AS (SELECT et, n_days, total_events,
      |    CAST(n_days AS HUGEINT) * q - CAST(total_events AS HUGEINT) * total_events AS fano_num,
      |    CAST(n_days - 1 AS HUGEINT) * total_events AS fano_den
      |  FROM g)
      |SELECT et AS event_type, n_days, total_events,
      |  CAST(fano_num AS VARCHAR) AS fano_num,
      |  CAST(fano_den AS VARCHAR) AS fano_den,
      |  CASE WHEN fano_den <> 0 THEN CAST(fano_num AS DOUBLE) / CAST(fano_den AS DOUBLE) END AS fano
      |FROM f ORDER BY event_type""".stripMargin

  // ------- quantile normalization across sources (q224)
  /** The cross-batch calibration operator: replace each doc's length
    * with the CORPUS value at the same quantile of its own source —
    * the quantile-normalization step that puts heterogeneous feeds on
    * one scale before length-matched sampling (q173) can trust the
    * numbers. Rank r of n_s within the source maps to pooled position
    * ⌈r·N/n_s⌉; both rankings order by (value, doc_id), so the map is
    * deterministic and the result is always a VALUE FROM THE CORPUS —
    * integer-exact, no interpolation. The census pins per source the
    * total absolute shift, the max shift, and a checksum of WHICH
    * docs moved.
    *
    * Scale shape: per-source ranks ride a source-keyed window; the
    * POOLED ranking uses [[RelationalOps.globalRowNumber]]
    * (range-partition + per-partition prefix offsets — the
    * no-single-task global sort, q174's machinery); the remap is one
    * equi-join on the pooled position. */
  private def q224(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"),
      col("source"), col("n_chars").cast(LongType).as("v"))
    val pooledV = RelationalOps.globalRowNumber(
      docs.select(col("doc_id").as("p_doc"), col("v").as("pv")),
      Seq(col("pv").asc, col("p_doc").asc), "pos")
      .select(col("pos"), col("pv"))
    val tot = docs.agg(count(lit(1)).as("n_all"))
    val ranked = docs
      .withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy(col("v").asc, col("doc_id").asc))
        .cast(LongType))
      .withColumn("n_src", count(lit(1)).over(
        Window.partitionBy("source")).cast(LongType))
    ranked.crossJoin(broadcast(tot))
      .withColumn("pos", expr("(r * n_all + n_src - 1) div n_src"))
      .join(pooledV, Seq("pos"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("v")).as("sum_orig"),
        sum(col("pv")).as("sum_normalized"),
        max(abs(col("pv") - col("v"))).as("max_shift"),
        sum(when(col("pv") =!= col("v"), col("doc_id")).otherwise(0L))
          .as("shifted_doc_sum"))
      .sortedOut("source")
  }

  private val q224Sql =
    """WITH docs AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents),
      |pooled AS (SELECT CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT) AS pos,
      |    v AS pv FROM docs),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM docs),
      |r AS (SELECT doc_id, source, v,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY v, doc_id) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      |  FROM docs),
      |j AS (SELECT r.source, r.doc_id, r.v, pooled.pv
      |  FROM r CROSS JOIN t
      |  JOIN pooled ON pooled.pos = (r.r * t.n_all + r.n_src - 1) // r.n_src)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(v) AS BIGINT) AS sum_orig,
      |  CAST(sum(pv) AS BIGINT) AS sum_normalized,
      |  CAST(max(abs(pv - v)) AS BIGINT) AS max_shift,
      |  CAST(sum(CASE WHEN pv <> v THEN doc_id ELSE 0 END) AS BIGINT) AS shifted_doc_sum
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // ------- payload value-domain drift between periods (q225)
  /** The schema/domain drift screen on the event PAYLOAD: split each
    * stream's history at the integer midpoint of the corpus date
    * span, extract the typed payload value (`props.k`), and diff the
    * early vs late VALUE DOMAINS — values added, removed, kept, with
    * checksums pinning WHICH. An enum that gained a variant, a sensor
    * that started emitting -1, a field that silently narrowed: all
    * surface here before any consumer casts blow up. q121 diffs token
    * vocabularies across corpora; this diffs payload domains across
    * TIME within one stream.
    *
    * Scale shape: one map-side (type, value, half) rollup collapses
    * the stream; the set diff is a full-outer self-merge on the
    * ≤|T|·|V| distinct frame — the label-spine trick (q207) keeps it
    * broadcastable if |V| explodes. Midpoint derives from a 1-row
    * bounds aggregate, broadcast. */
  private def q225(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast(LongType).as("kv"))
      .where(col("kv").isNotNull)
    val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val halves = ev.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) * 2 >= datediff(col("d1"), col("d0")))
      .groupBy("et", "kv")
      .agg(max(when(!col("late"), 1L).otherwise(0L)).as("in_old"),
        max(when(col("late"), 1L).otherwise(0L)).as("in_new"))
    halves.groupBy("et")
      .agg(sum(when(col("in_old") === 1 && col("in_new") === 1, 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("in_old") === 0, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_new") === 0, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("in_old") === 0, col("kv")).otherwise(0L))
          .as("added_sum"),
        sum(when(col("in_new") === 0, col("kv")).otherwise(0L))
          .as("removed_sum"))
      .select(col("et").as("event_type"), col("n_kept"), col("n_added"),
        col("n_removed"), col("added_sum"), col("removed_sum"))
      .sortedOut("event_type")
  }

  private val q225Sql =
    """WITH ev AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(json_extract(props, '$.k') AS BIGINT) AS kv
      |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |h AS (SELECT et, kv,
      |    max(CASE WHEN (day - d0) * 2 >= (d1 - d0) THEN 0 ELSE 1 END) AS in_old,
      |    max(CASE WHEN (day - d0) * 2 >= (d1 - d0) THEN 1 ELSE 0 END) AS in_new
      |  FROM ev CROSS JOIN b GROUP BY et, kv)
      |SELECT et AS event_type,
      |  CAST(sum(CASE WHEN in_old = 1 AND in_new = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN in_old = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN in_new = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN in_old = 0 THEN kv ELSE 0 END) AS BIGINT) AS added_sum,
      |  CAST(sum(CASE WHEN in_new = 0 THEN kv ELSE 0 END) AS BIGINT) AS removed_sum
      |FROM h GROUP BY et ORDER BY event_type""".stripMargin

  // ------- earth-mover distance drift per source (q226)
  /** The INTEGRAL member of the drift family: 1-Wasserstein distance
    * between each source's doc-length distribution and the corpus —
    * W₁ = Σᵢ |F_src(vᵢ) − F_all(vᵢ)|·(vᵢ₊₁ − vᵢ) over corpus-distinct
    * lengths. q213's KS answers "how far apart at the worst point";
    * EMD answers "how much mass must MOVE how far" — the number that
    * prices a length-rebalancing resample (q173) in actual
    * characters. Cleared to integers: num = Σ|cum_src·N −
    * cum_all·n_src|·gap with den = n_src·N, exported as canonical
    * digits plus a milli-char scalar.
    *
    * Scale shape: unlike TVD (q212), the gap-weighted running-cum
    * summand has no algebraic split — the |S|×|L| grid is genuinely
    * required. It is built as corpus-values STREAMED × sources
    * BROADCAST through [[RelationalOps.boundedRegistry]] (static
    * 4096 bound for the planLint proof, LOUD failure on overflow —
    * wave-12 contract), then one source-keyed window accumulates
    * F_src at every corpus value. |L| is domain-bounded, so the grid
    * is |S|·|L| and each per-source window partition is |L| rows —
    * never data-sized, even under 99%-single-source skew. */
  private def q226(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val cells = Tables.documents(s, d)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    // distributed prefix scan + lead: same values as the unpartitioned
    // cum/lead windows, no single-partition funnel on the value grain
    val byV = RelationalOps.globalLead1(
        RelationalOps.globalRunningSum(
          cells.groupBy("v").agg(sum(col("c")).as("cnt_all")),
          Seq(col("v").asc), "cnt_all", "cum_all"),
        Seq(col("v").asc), "v", "v_next")
      .withColumn("gap", coalesce(col("v_next") - col("v"), lit(0L)))
      .drop("v_next")
    val bySrc = RelationalOps.boundedRegistry(
      cells.groupBy("source").agg(sum(col("c")).as("n_src")),
      4096, "q226 source registry")
    val tot = cells.agg(sum(col("c")).as("n_all"))
    byV.crossJoin(broadcast(bySrc))
      .join(cells, Seq("source", "v"), "left_outer")
      .na.fill(0L, Seq("c"))
      .withColumn("cum_src", sum(col("c")).over(
        Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("term",
        abs(dec(col("cum_src")) * dec(col("n_all")) -
          dec(col("cum_all")) * dec(col("n_src"))) * dec(col("gap")))
      .groupBy("source")
      .agg(max(col("n_src")).as("n_src"), max(col("n_all")).as("n_all"),
        sum(col("term")).cast(DecimalType(38, 0)).as("emd_num"))
      .select(col("source"), col("n_src"), col("n_all"),
        col("emd_num").cast(StringType).as("emd_num"),
        expr("CAST(emd_num * 1000 div (CAST(n_src AS DECIMAL(38,0)) * n_all) AS BIGINT)")
          .as("emd_millichars"))
      .sortedOut("source")
  }

  private val q226Sql =
    """WITH cells AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |bv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt_all FROM cells GROUP BY 1),
      |bvc AS (SELECT v, cnt_all,
      |    CAST(sum(cnt_all) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all,
      |    CAST(coalesce(lead(v) OVER (ORDER BY v) - v, 0) AS BIGINT) AS gap
      |  FROM bv),
      |bs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM cells),
      |grid AS (SELECT bs.source, bvc.v, bvc.cnt_all, bvc.cum_all, bvc.gap,
      |    bs.n_src, coalesce(cells.c, 0) AS c
      |  FROM bvc CROSS JOIN bs
      |  LEFT JOIN cells ON cells.source = bs.source AND cells.v = bvc.v),
      |cs AS (SELECT source, v, cum_all, gap, n_src,
      |    CAST(sum(c) OVER (PARTITION BY source ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_src
      |  FROM grid),
      |g AS (SELECT source, n_src, n_all,
      |    CAST(sum(abs(CAST(cum_src AS HUGEINT) * n_all -
      |      CAST(cum_all AS HUGEINT) * n_src) * gap) AS HUGEINT) AS emd_num
      |  FROM cs CROSS JOIN t GROUP BY source, n_src, n_all)
      |SELECT source, n_src, n_all, CAST(emd_num AS VARCHAR) AS emd_num,
      |  CAST(emd_num * 1000 // (CAST(n_src AS HUGEINT) * n_all) AS BIGINT) AS emd_millichars
      |FROM g ORDER BY source""".stripMargin

  // ------- winsorized totals per group, exact order statistics (q227)
  /** The tail-robust revenue census: per return flag, the order-value
    * total AFTER clamping to the exact p05/p95 ORDER STATISTICS
    * (positions ⌈0.05n⌉ / ⌈0.95n⌉ in the sorted column, pure integer
    * arithmetic — values FROM THE DATA, the q210 policy, where q83's
    * approx-percentile trims by a sketch). Winsorized totals are what
    * a revenue dashboard should chart when single monster orders
    * would otherwise own the axis; the census also pins how many rows
    * clamped at each end.
    *
    * Scale shape: the (flag, cents) collapse bounds everything by the
    * distinct-value domain; cutoffs derive from the cum window
    * (q210's shape) as a 2-row-per-flag broadcast back onto the
    * value frame — the raw table is touched once. */
  private def q227(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = t(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast(LongType).as("v"))
      .groupBy("flag", "v").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("flag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("flag")))
    val cuts = cum
      .withColumn("lo_pos", expr("(n * 5 + 99) div 100"))
      .withColumn("hi_pos", expr("(n * 95 + 99) div 100"))
      .groupBy("flag")
      .agg(min(when(col("cum") >= col("lo_pos"), col("v"))).as("lo"),
        min(when(col("cum") >= col("hi_pos"), col("v"))).as("hi"),
        max(col("n")).as("n"))
    cum.join(broadcast(cuts.drop("n")), Seq("flag"))
      .groupBy("flag")
      .agg(sum(col("cnt")).as("n"),
        max(col("lo")).as("p05"), max(col("hi")).as("p95"),
        sum(col("v") * col("cnt")).as("raw_sum"),
        sum(greatest(least(col("v"), col("hi")), col("lo")) * col("cnt"))
          .as("winsorized_sum"),
        sum(when(col("v") < col("lo"), col("cnt")).otherwise(0L))
          .as("n_clamped_lo"),
        sum(when(col("v") > col("hi"), col("cnt")).otherwise(0L))
          .as("n_clamped_hi"))
      .sortedOut("flag")
  }

  private val q227Sql =
    """WITH g AS (SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, v, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n
      |  FROM g),
      |cuts AS (SELECT flag,
      |    CAST(min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN v END) AS BIGINT) AS lo,
      |    CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN v END) AS BIGINT) AS hi
      |  FROM c GROUP BY flag)
      |SELECT c.flag, CAST(sum(cnt) AS BIGINT) AS n,
      |  CAST(max(lo) AS BIGINT) AS p05, CAST(max(hi) AS BIGINT) AS p95,
      |  CAST(sum(v * cnt) AS BIGINT) AS raw_sum,
      |  CAST(sum(greatest(least(v, hi), lo) * cnt) AS BIGINT) AS winsorized_sum,
      |  CAST(sum(CASE WHEN v < lo THEN cnt ELSE 0 END) AS BIGINT) AS n_clamped_lo,
      |  CAST(sum(CASE WHEN v > hi THEN cnt ELSE 0 END) AS BIGINT) AS n_clamped_hi
      |FROM c JOIN cuts ON cuts.flag = c.flag
      |GROUP BY c.flag ORDER BY c.flag""".stripMargin

  // ------- trade-graph reciprocity + degree assortativity (q228)
  /** Two one-number health checks on the directed nation trade graph
    * (q117's edge set): RECIPROCITY — what fraction of trade
    * relationships flow both ways, unweighted (edge-reverse-exists,
    * exact ppm) and weighted (Σ min(w,w_rev)/Σw, the mass that could
    * pair up) — and STRENGTH assortativity, the Pearson correlation
    * between source out-strength and destination in-strength
    * (weighted degrees — plain edge-count degrees are constant on
    * the complete small-SF nation graph and would null the
    * statistic) across edges: negative = hub-and-spoke (big
    * exporters sell to small importers — the shape that makes q64's
    * salting necessary), positive = core-periphery. Every sum is an
    * exact integer; the correlation is sqrt+divide over them (q174's
    * policy), NULLed on zero variance rather than divided by it.
    *
    * Scale shape: the fact-table joins are q117's (broadcast dims,
    * one orderkey shuffle); everything after runs on the ≤|N|²
    * distinct-edge frame — degree joins, the reverse-edge self-join,
    * the 1-row moment fold. */
  private def q228(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast(LongType).as("src"),
        col("s_nationkey").cast(LongType).as("dst"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"),
      col("w").as("w_rev"))
    val paired = edges.join(rev, Seq("src", "dst"), "left_outer")
      .na.fill(0L, Seq("w_rev"))
    val outdeg = edges.groupBy("src").agg(sum(col("w")).as("j"))
    val indeg = edges.groupBy("dst").agg(sum(col("w")).as("k"))
    val jk = edges.join(broadcast(outdeg), Seq("src"))
      .join(broadcast(indeg), Seq("dst"))
    val recip = paired.agg(
      count(lit(1)).as("n_edges"),
      sum(when(col("w_rev") > 0, 1L).otherwise(0L)).as("n_recip"),
      sum(col("w")).as("w_total"),
      sum(least(col("w"), col("w_rev"))).as("w_paired"))
    val moments = jk.agg(count(lit(1)).as("m"),
      sum(col("j")).as("sj"), sum(col("k")).as("sk"),
      sum(col("j") * col("k")).as("sjk"),
      sum(col("j") * col("j")).as("sjj"),
      sum(col("k") * col("k")).as("skk"))
    recip.crossJoin(broadcast(moments))
      .select(col("n_edges"), col("n_recip"),
        expr("n_recip * 1000000 div n_edges").as("recip_ppm"),
        col("w_total"), col("w_paired"),
        expr("w_paired * 1000000 div w_total").as("w_recip_ppm"),
        // a regular graph (all degrees equal — the complete nation
        // graph at small SF) has zero degree variance: correlation
        // undefined → NULL, never a divide-by-zero (q207's guard)
        when((dec(col("m")) * dec(col("sjj")) - dec(col("sj")) * dec(col("sj"))) > 0 &&
             (dec(col("m")) * dec(col("skk")) - dec(col("sk")) * dec(col("sk"))) > 0,
          (dec(col("m")) * dec(col("sjk")) - dec(col("sj")) * dec(col("sk")))
            .cast(DoubleType) /
            (sqrt((dec(col("m")) * dec(col("sjj")) - dec(col("sj")) * dec(col("sj")))
              .cast(DoubleType)) *
             sqrt((dec(col("m")) * dec(col("skk")) - dec(col("sk")) * dec(col("sk")))
              .cast(DoubleType)))).as("assortativity"))
  }

  private val q228Sql =
    """WITH e AS (SELECT CAST(c.c_nationkey AS BIGINT) AS src,
      |    CAST(s.s_nationkey AS BIGINT) AS dst, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
      |p AS (SELECT a.src, a.dst, a.w, coalesce(b.w, 0) AS w_rev
      |  FROM e a LEFT JOIN e b ON b.src = a.dst AND b.dst = a.src),
      |od AS (SELECT src, CAST(sum(w) AS BIGINT) AS j FROM e GROUP BY 1),
      |id AS (SELECT dst, CAST(sum(w) AS BIGINT) AS k FROM e GROUP BY 1),
      |jk AS (SELECT e.src, e.dst, od.j, id.k FROM e
      |  JOIN od USING (src) JOIN id USING (dst)),
      |r AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
      |    CAST(sum(CASE WHEN w_rev > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_recip,
      |    CAST(sum(w) AS BIGINT) AS w_total,
      |    CAST(sum(least(w, w_rev)) AS BIGINT) AS w_paired FROM p),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(j) AS BIGINT) AS sj,
      |    CAST(sum(k) AS BIGINT) AS sk, CAST(sum(j * k) AS BIGINT) AS sjk,
      |    CAST(sum(j * j) AS BIGINT) AS sjj, CAST(sum(k * k) AS BIGINT) AS skk
      |  FROM jk)
      |SELECT n_edges, n_recip,
      |  CAST(n_recip * 1000000 // n_edges AS BIGINT) AS recip_ppm,
      |  w_total, w_paired,
      |  CAST(w_paired * 1000000 // w_total AS BIGINT) AS w_recip_ppm,
      |  CASE WHEN CAST(m AS HUGEINT) * sjj - CAST(sj AS HUGEINT) * sj > 0
      |        AND CAST(m AS HUGEINT) * skk - CAST(sk AS HUGEINT) * sk > 0 THEN
      |    CAST(CAST(m AS HUGEINT) * sjk - CAST(sj AS HUGEINT) * sk AS DOUBLE) /
      |      (sqrt(CAST(CAST(m AS HUGEINT) * sjj - CAST(sj AS HUGEINT) * sj AS DOUBLE)) *
      |       sqrt(CAST(CAST(m AS HUGEINT) * skk - CAST(sk AS HUGEINT) * sk AS DOUBLE)))
      |  END AS assortativity
      |FROM r CROSS JOIN m""".stripMargin

  // ------- weekday seasonality profile per stream (q229)
  /** The calendar-structure census: each event stream's volume share
    * by ISO weekday (ppm-exact) with the peak day flagged — the
    * profile that decides whether a training snapshot cut on a
    * Tuesday under-represents weekend behavior, and the baseline
    * q218/q219 should be read against (a 7-day cycle is the most
    * common "false changepoint"). Spark's `weekday()` (0 = Monday)
    * shifted to ISO 1–7 matches DuckDB's `isodow` exactly; the peak
    * flag is a rank over (n DESC, dow ASC) — deterministic under
    * ties.
    *
    * Scale shape: one map-side (type, dow) rollup — 7 rows per
    * stream; the share and peak derive from windows over those. */
  private def q229(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .select(col("event_type").as("event_type"),
        (weekday(col("ts")) + 1).cast(LongType).as("isodow"))
      .groupBy("event_type", "isodow").agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        Window.partitionBy("event_type")))
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .withColumn("is_peak", (row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("n").desc, col("isodow").asc)) === 1))
      .select("event_type", "isodow", "n", "share_ppm", "is_peak")
      .sortedOutWide("event_type", "isodow")
  }

  private val q229Sql =
    """WITH g AS (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS isodow,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, isodow, n,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY n DESC, isodow ASC) AS rk
      |  FROM g)
      |SELECT event_type, isodow, n,
      |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
      |  rk = 1 AS is_peak
      |FROM w ORDER BY event_type, isodow""".stripMargin

  // ------- cohort lifetime-value curve (q230)
  /** The monetized companion to q109's retention matrix: customers
    * cohorted by FIRST-order month, and per (cohort, age-in-months)
    * the active-customer count, the cents spent at that age, and the
    * RUNNING cumulative — the LTV curve whose flattening point tells
    * a data buyer how many months of history are worth licensing.
    * Month index 12y+m keeps ages integral; everything is LONG cents
    * and counts.
    *
    * Scale shape: the first-order month is one customer-keyed
    * aggregate joined back on the same key (one shuffle partitioning
    * reused); the curve and its cumulative window live on
    * ≤|cohorts|·|ages| rows. */
  private def q230(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, d, "orders")
      .select(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast(LongType).as("m"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
    val cohort = o.groupBy("c").agg(min(col("m")).as("m0"))
    o.join(cohort, Seq("c"))
      .withColumn("age", col("m") - col("m0"))
      .groupBy(col("m0").as("cohort_m"), col("age"))
      .agg(countDistinct(col("c")).as("n_active"),
        count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .withColumn("cum_cents", sum(col("cents")).over(
        Window.partitionBy("cohort_m").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .sortedOutWide("cohort_m", "age")
  }

  private val q230Sql =
    """WITH o AS (SELECT o_custkey AS c,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |coh AS (SELECT c, min(m) AS m0 FROM o GROUP BY c),
      |g AS (SELECT m0 AS cohort_m, m - m0 AS age,
      |    CAST(count(DISTINCT c) AS BIGINT) AS n_active,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(cents) AS BIGINT) AS cents
      |  FROM o JOIN coh USING (c) GROUP BY 1, 2)
      |SELECT cohort_m, age, n_active, n_orders, cents,
      |  CAST(sum(cents) OVER (PARTITION BY cohort_m ORDER BY age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |FROM g ORDER BY cohort_m, age""".stripMargin

  // ------- market-basket affinity: top part pairs by support (q231)
  /** The basket-level co-occurrence operator (q120 is its
    * user-session sibling): part pairs appearing in the same ORDER,
    * ranked by support with exact ppm lift = support·N/(n_a·n_b) —
    * lift > 1e6 means the pair co-sells beyond independence. Parts
    * dedup within an order first (two lines of one part are one
    * basket membership); the top-20 cut orders by (support DESC,
    * a, b) so the boundary is deterministic, and `orderBy().limit()`
    * plans as TakeOrderedAndProject — no global sort.
    *
    * Scale shape: the self-join explodes each order into
    * basket-size² pairs — bounded by the schema's small basket (≤7
    * lines); a monster-basket corpus would cap per-order pairs the
    * way [[graft.dedup.Dedup]] caps LSH buckets (documented knob,
    * not needed here). Support counting is map-side combinable; the
    * per-part totals broadcast back onto the pair frame. */
  private def q231(s: SparkSession, d: String): DataFrame = {
    val items = t(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").cast(LongType).as("p"))
      .distinct()
    val nOrders = items.select("o").distinct().agg(count(lit(1)).as("n_orders"))
    val perPart = items.groupBy("p").agg(count(lit(1)).as("n_part"))
    val pairs = items.as("a").join(items.as("b"), Seq("o"))
      .where(col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("support"))
    pairs
      .join(broadcast(perPart.select(col("p").as("pa"), col("n_part").as("na"))), Seq("pa"))
      .join(broadcast(perPart.select(col("p").as("pb"), col("n_part").as("nb"))), Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_ppm",
        expr("support * n_orders * 1000000 div (na * nb)"))
      .select("pa", "pb", "support", "na", "nb", "lift_ppm")
      .orderBy(col("support").desc, col("pa").asc, col("pb").asc)
      .limit(20)
  }

  private val q231Sql =
    """WITH items AS (SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
      |  FROM lineitem),
      |t AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM items),
      |pp AS (SELECT p, CAST(count(*) AS BIGINT) AS n_part FROM items GROUP BY p),
      |pr AS (SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS support
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2)
      |SELECT pa, pb, support, na.n_part AS na, nb.n_part AS nb,
      |  CAST(support * t.n_orders * 1000000 // (na.n_part * nb.n_part) AS BIGINT) AS lift_ppm
      |FROM pr JOIN pp na ON na.p = pr.pa JOIN pp nb ON nb.p = pr.pb
      |CROSS JOIN t
      |ORDER BY support DESC, pa, pb LIMIT 20""".stripMargin

  // ------- transition latency percentiles (q232)
  /** q148 counts WHICH transitions happen; this measures HOW FAST:
    * per (from_type → to_type) consecutive-event pair, the exact
    * lower-median and p90 of the gap in seconds (order statistics
    * from the data — the ≥-gate of q210 at cum·2 ≥ n and
    * cum·10 ≥ 9n) plus the exact mean as one division. The funnel
    * question "users click→purchase, but how long does that take"
    * is this row.
    *
    * Scale shape: one user-keyed shuffle for the lead (q148's
    * partitioning), a map-side (pair, gap) collapse, then per-pair
    * value windows. Gap values are corpus-timespan-bounded; at an
    * unbounded domain the documented fallback is the
    * [[RelationalOps.globalRowNumber]] per-group range partition
    * (q210's note). */
  private def q232(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"),
        (unix_millis(col("ts")).cast(LongType)).as("ms"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .withColumn("to_ms", lead(col("ms"), 1).over(w))
      .where(col("to_type").isNotNull)
      .select(col("from_type"), col("to_type"),
        ((col("to_ms") - col("ms")) / 1000).cast(LongType).as("gap_s"))
      .groupBy("from_type", "to_type", "gap_s").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("from_type", "to_type").orderBy("gap_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("from_type", "to_type")
    gaps
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("n", sum(col("cnt")).over(wt))
      .withColumn("sum_gap", sum(col("gap_s") * col("cnt")).over(wt))
      .groupBy("from_type", "to_type")
      .agg(max(col("n")).as("n_transitions"),
        min(when(col("cum") * 2 >= col("n"), col("gap_s"))).as("median_gap_s"),
        min(when(col("cum") * 10 >= col("n") * 9, col("gap_s"))).as("p90_gap_s"),
        (max(col("sum_gap")).cast(DoubleType) / max(col("n")))
          .as("mean_gap_s"))
      .sortedOutWide("from_type", "to_type")
  }

  private val q232Sql =
    """WITH x AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type,
      |    CAST((epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch_ms(ts)) // 1000 AS BIGINT) AS gap_s
      |  FROM events),
      |g AS (SELECT from_type, to_type, gap_s, CAST(count(*) AS BIGINT) AS cnt
      |  FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2, 3),
      |c AS (SELECT from_type, to_type, gap_s, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY from_type, to_type ORDER BY gap_s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY from_type, to_type) AS BIGINT) AS n,
      |    CAST(sum(gap_s * cnt) OVER (PARTITION BY from_type, to_type) AS BIGINT) AS sum_gap
      |  FROM g)
      |SELECT from_type, to_type, CAST(max(n) AS BIGINT) AS n_transitions,
      |  CAST(min(CASE WHEN cum * 2 >= n THEN gap_s END) AS BIGINT) AS median_gap_s,
      |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN gap_s END) AS BIGINT) AS p90_gap_s,
      |  CAST(max(sum_gap) AS DOUBLE) / max(n) AS mean_gap_s
      |FROM c GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin

  // ------- MAD-based robust outlier census (q233)
  /** The robust twin of q200's mean/std windowed z-score: per event
    * stream, flag days where |count − median| > 3·MAD — median and
    * MAD both exact lower order statistics, so the gate is pure
    * integer comparison and NO outlier can poison the scale it is
    * judged against (the exact failure q200's wave-8 contaminated-dip
    * pin documents for trailing mean/std). A zero-MAD stream (over
    * half the days identical) flags every deviating day — the
    * documented degenerate convention.
    *
    * Scale shape: (type, day) rollup; two value-domain median passes
    * (q210's gate) and one broadcast join back; no data-sized
    * window. */
  private def q233(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .groupBy("et", "day").agg(count(lit(1)).as("c"))
    def lowerMedian(df: DataFrame, vCol: String, out: String): DataFrame =
      df.groupBy(col("et"), col(vCol).as("v")).agg(count(lit(1)).as("f"))
        .withColumn("cumf", sum(col("f")).over(
          Window.partitionBy("et").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nd", sum(col("f")).over(Window.partitionBy("et")))
        .where(col("cumf") * 2 >= col("nd"))
        .groupBy("et").agg(min(col("v")).as(out))
    val med = lowerMedian(daily, "c", "med")
    val withDev = daily.join(broadcast(med), Seq("et"))
      .withColumn("adev", abs(col("c") - col("med")))
    val mad = lowerMedian(withDev, "adev", "mad")
    withDev.join(broadcast(mad), Seq("et"))
      .withColumn("is_out", col("adev") > col("mad") * 3)
      .groupBy("et")
      .agg(count(lit(1)).as("n_days"), max(col("med")).as("median_daily"),
        max(col("mad")).as("mad"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        min(when(col("is_out"), col("day")).otherwise(lit(null)))
          .cast(StringType).as("first_outlier_day"),
        sum(when(col("is_out"), col("c")).otherwise(0L)).as("outlier_mass"))
      .select(col("et").as("event_type"), col("n_days"), col("median_daily"),
        col("mad"), col("n_outliers"), col("first_outlier_day"),
        col("outlier_mass"))
      .sortedOut("event_type")
  }

  private val q233Sql =
    """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |m1 AS (SELECT et, CAST(min(v) AS BIGINT) AS med FROM (
      |    SELECT et, c AS v,
      |      CAST(sum(count(*)) OVER (PARTITION BY et ORDER BY c
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumf,
      |      CAST(sum(count(*)) OVER (PARTITION BY et) AS BIGINT) AS nd
      |    FROM daily GROUP BY et, c)
      |  WHERE cumf * 2 >= nd GROUP BY et),
      |dv AS (SELECT daily.et, day, c, med, abs(c - med) AS adev
      |  FROM daily JOIN m1 USING (et)),
      |m2 AS (SELECT et, CAST(min(v) AS BIGINT) AS mad FROM (
      |    SELECT et, adev AS v,
      |      CAST(sum(count(*)) OVER (PARTITION BY et ORDER BY adev
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumf,
      |      CAST(sum(count(*)) OVER (PARTITION BY et) AS BIGINT) AS nd
      |    FROM dv GROUP BY et, adev)
      |  WHERE cumf * 2 >= nd GROUP BY et)
      |SELECT dv.et AS event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(max(med) AS BIGINT) AS median_daily, CAST(max(mad) AS BIGINT) AS mad,
      |  CAST(sum(CASE WHEN adev > mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(min(CASE WHEN adev > mad * 3 THEN day END) AS VARCHAR) AS first_outlier_day,
      |  CAST(sum(CASE WHEN adev > mad * 3 THEN c ELSE 0 END) AS BIGINT) AS outlier_mass
      |FROM dv JOIN m2 USING (et) GROUP BY 1 ORDER BY event_type""".stripMargin

  // ------- two-proportion A/B test, cleared z² (q234)
  /** The experiment-readout operator: users split A/B by parity of
    * their id (the deterministic assignment a real platform hashes),
    * outcome = purchase share of events; the readout is the exact
    * contingency (n_a, x_a, n_b, x_b), the difference in ppm, and
    * the pooled two-proportion z² with EVERY denominator cleared:
    * z² = (x_a·n_b − x_b·n_a)²·n / (n_a·n_b·x·(n−x)) — numerator and
    * denominator DECIMAL(38,0) integers exported as digits, the
    * statistic one IEEE division (q205's χ² discipline; z² IS the
    * 2×2 χ², so the engines cross-check). z² > 3.84 ⇒ p < .05.
    *
    * Scale shape: one map-side rollup to (arm, outcome) counts —
    * four numbers; everything else is scalar arithmetic on a 1-row
    * frame. */
  private def q234(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val arms = Tables.events(s, d)
      .select((col("user_id") % 2 === 0).as("arm_a"),
        (col("event_type") === "purchase").as("hit"))
      .agg(
        sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm_a") && col("hit"), 1L).otherwise(0L)).as("x_a"),
        sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("arm_a") && col("hit"), 1L).otherwise(0L)).as("x_b"))
    arms
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("x", col("x_a") + col("x_b"))
      .withColumn("rate_a_ppm", expr("x_a * 1000000 div n_a"))
      .withColumn("rate_b_ppm", expr("x_b * 1000000 div n_b"))
      .withColumn("d0", dec(col("x_a")) * dec(col("n_b")) -
        dec(col("x_b")) * dec(col("n_a")))
      .withColumn("z2_num", (col("d0") * col("d0") * dec(col("n")))
        .cast(DecimalType(38, 0)))
      .withColumn("z2_den", (dec(col("n_a")) * dec(col("n_b")) *
        dec(col("x")) * dec(col("n") - col("x"))).cast(DecimalType(38, 0)))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("rate_a_ppm"), col("rate_b_ppm"),
        col("z2_num").cast(StringType).as("z2_num"),
        col("z2_den").cast(StringType).as("z2_den"),
        when(col("z2_den") =!= 0,
          col("z2_num").cast(DoubleType) / col("z2_den").cast(DoubleType))
          .as("z_squared"))
  }

  private val q234Sql =
    """WITH a AS (SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x_b
      |  FROM events),
      |b AS (SELECT *, n_a + n_b AS n, x_a + x_b AS x,
      |    CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a AS d0
      |  FROM a)
      |SELECT n_a, x_a, n_b, x_b,
      |  CAST(x_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
      |  CAST(x_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
      |  CAST(d0 * d0 * n AS VARCHAR) AS z2_num,
      |  CAST(CAST(n_a AS HUGEINT) * n_b * x * (n - x) AS VARCHAR) AS z2_den,
      |  CASE WHEN CAST(n_a AS HUGEINT) * n_b * x * (n - x) <> 0 THEN
      |    CAST(d0 * d0 * n AS DOUBLE) /
      |    CAST(CAST(n_a AS HUGEINT) * n_b * x * (n - x) AS DOUBLE) END AS z_squared
      |FROM b""".stripMargin

  // ------- source concentration: HHI census (q235)
  /** The one-number answer to "is this corpus a monoculture": the
    * Herfindahl–Hirschman index of source shares, exact —
    * hhi_ppm = Σn_s²·10⁶ div N² (1e6 = single source, 1e6/S =
    * perfectly balanced) — plus the top-source share and the
    * effective number of sources 1/HHI (one IEEE division), the
    * diversity number a mixture designer compares against the
    * nominal source count before q220's reweighting is even worth
    * pricing. Gini (q165) orders the whole Lorenz curve; HHI is the
    * screening scalar.
    *
    * Scale shape: one map-side census, |S|-row arithmetic, 1-row
    * output. */
  private def q235(s: SparkSession, d: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val bySrc = Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    bySrc.agg(count(lit(1)).as("n_sources"),
        sum(col("n_docs")).as("n_all"),
        max(col("n_docs")).as("top_docs"),
        sum(dec(col("n_docs")) * dec(col("n_docs")))
          .cast(DecimalType(38, 0)).as("sq"))
      .select(col("n_sources"), col("n_all"), col("top_docs"),
        expr("top_docs * 1000000 div n_all").as("top_share_ppm"),
        expr("CAST(sq * 1000000 div (CAST(n_all AS DECIMAL(38,0)) * n_all) AS BIGINT)")
          .as("hhi_ppm"),
        ((dec(col("n_all")) * dec(col("n_all"))).cast(DoubleType) /
          col("sq").cast(DoubleType)).as("effective_sources"))
  }

  private val q235Sql =
    """WITH b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_sources,
      |  CAST(sum(n_docs) AS BIGINT) AS n_all,
      |  CAST(max(n_docs) AS BIGINT) AS top_docs,
      |  CAST(max(n_docs) * 1000000 // sum(n_docs) AS BIGINT) AS top_share_ppm,
      |  CAST(sum(CAST(n_docs AS HUGEINT) * n_docs) * 1000000 //
      |    (CAST(sum(n_docs) AS HUGEINT) * sum(n_docs)) AS BIGINT) AS hhi_ppm,
      |  CAST(CAST(sum(n_docs) AS HUGEINT) * sum(n_docs) AS DOUBLE) /
      |    CAST(sum(CAST(n_docs AS HUGEINT) * n_docs) AS DOUBLE) AS effective_sources
      |FROM b""".stripMargin

  // ------- head coverage: docs needed for X% of char mass (q236)
  /** How head-heavy is the corpus? For each coverage target (50 / 90
    * / 99% of total character mass), the number of LONGEST docs that
    * reach it and the length threshold where the target crosses —
    * the curve that decides whether "train on the biggest documents
    * first" covers most tokens with a fraction of the rows.
    * Evaluated at distinct-length granularity (every reported
    * threshold is a value from the data; ties are counted whole, the
    * documented convention), so every number is exact.
    *
    * Scale shape: the (length → count, mass) collapse is map-side;
    * the descending cumulative rides one window over the
    * domain-bounded distinct-length frame (q204's argument) — the
    * raw corpus is never sorted. */
  private def q236(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLen = Tables.documents(s, d)
      .groupBy(col("n_chars").as("len"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("mass"))
    // descending cumulatives via the distributed prefix scan; totals
    // as a 1-row broadcast (the old Window.partitionBy(lit(1)) was a
    // disguised single-partition window)
    val tot = byLen.agg(sum(col("mass")).as("m_total"),
      sum(col("cnt")).as("n_total"))
    val cum = RelationalOps.globalRunningSum(
        RelationalOps.globalRunningSum(byLen,
          Seq(col("len").desc), "cnt", "docs_ge"),
        Seq(col("len").desc), "mass", "mass_ge")
      .crossJoin(broadcast(tot))
    val targets = Seq(50L, 90L, 99L)
    targets.map { pct =>
      cum.where(col("mass_ge") * 100 >= col("m_total") * pct)
        .agg(lit(pct).as("target_pct"),
          min(col("docs_ge")).as("n_docs_needed"),
          max(col("len")).as("len_threshold"),
          max(col("n_total")).as("n_total"),
          max(col("m_total")).as("mass_total"))
    }.reduce(_ unionByName _)
      .withColumn("doc_share_ppm", expr("n_docs_needed * 1000000 div n_total"))
      .sortedOut("target_pct")
  }

  private val q236Sql =
    """WITH bl AS (SELECT CAST(n_chars AS BIGINT) AS len,
      |    CAST(count(*) AS BIGINT) AS cnt, CAST(sum(n_chars) AS BIGINT) AS mass
      |  FROM documents GROUP BY 1),
      |c AS (SELECT len,
      |    CAST(sum(cnt) OVER (ORDER BY len DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS docs_ge,
      |    CAST(sum(mass) OVER (ORDER BY len DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS mass_ge,
      |    CAST(sum(mass) OVER () AS BIGINT) AS m_total,
      |    CAST(sum(cnt) OVER () AS BIGINT) AS n_total
      |  FROM bl),
      |t(target_pct) AS (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)), (CAST(99 AS BIGINT)))
      |SELECT target_pct,
      |  CAST(min(docs_ge) AS BIGINT) AS n_docs_needed,
      |  CAST(max(len) AS BIGINT) AS len_threshold,
      |  CAST(max(n_total) AS BIGINT) AS n_total,
      |  CAST(max(m_total) AS BIGINT) AS mass_total,
      |  CAST(min(docs_ge) * 1000000 // max(n_total) AS BIGINT) AS doc_share_ppm
      |FROM c CROSS JOIN t
      |WHERE mass_ge * 100 >= m_total * target_pct
      |GROUP BY target_pct ORDER BY target_pct""".stripMargin

  // ------- calendar completeness: zero-day gap census (q237)
  /** The stream-completeness audit: per event type, how many calendar
    * days inside the stream's own [min, max] span have ZERO events,
    * and the longest silent stretch with its start date — the
    * ingestion-outage detector (a feed that "looks fine" by volume
    * can still be missing whole days, and q218's changepoint will NOT
    * flag a gap the daily rollup never materializes). All integer
    * date arithmetic: missing = span − observed, longest gap from the
    * lead() diff over observed days.
    *
    * Scale shape: (type, day) distinct collapse, one type-keyed
    * window for the lead, a |T|-row fold. */
  private def q237(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .select(col("event_type").as("et"), to_date(col("ts")).as("day"))
      .distinct()
    val wo = Window.partitionBy("et").orderBy("day")
    days
      .withColumn("nxt", lead(col("day"), 1).over(wo))
      .withColumn("gap", datediff(col("nxt"), col("day")) - 1)
      .withColumn("mg", max(col("gap")).over(Window.partitionBy("et")))
      .groupBy("et")
      .agg(count(lit(1)).as("n_observed_days"),
        (datediff(max(col("day")), min(col("day"))) + 1).cast(LongType)
          .as("span_days"),
        max(col("gap")).cast(LongType).as("longest_gap_days"),
        min(when(col("gap") === col("mg"), col("day"))).cast(StringType)
          .as("longest_gap_after"))
      .withColumn("n_missing_days",
        col("span_days") - col("n_observed_days"))
      .select(col("et").as("event_type"), col("n_observed_days"),
        col("span_days"), col("n_missing_days"),
        col("longest_gap_days"), col("longest_gap_after"))
      .sortedOut("event_type")
  }

  private val q237Sql =
    """WITH days AS (SELECT DISTINCT event_type AS et, CAST(ts AS DATE) AS day
      |  FROM events),
      |w AS (SELECT et, day,
      |    lead(day) OVER (PARTITION BY et ORDER BY day) AS nxt
      |  FROM days),
      |g AS (SELECT et, day, CAST(nxt - day - 1 AS BIGINT) AS gap FROM w),
      |mx AS (SELECT et, max(gap) AS mg FROM g GROUP BY et)
      |SELECT g.et AS event_type,
      |  CAST(count(*) AS BIGINT) AS n_observed_days,
      |  CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
      |  CAST(max(day) - min(day) + 1 - count(*) AS BIGINT) AS n_missing_days,
      |  CAST(max(mg) AS BIGINT) AS longest_gap_days,
      |  CAST(min(CASE WHEN gap = mg THEN day END) AS VARCHAR) AS longest_gap_after
      |FROM g JOIN mx ON mx.et = g.et
      |GROUP BY 1 ORDER BY event_type""".stripMargin

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

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q39_pivot",            q39 _, Some(q39Sql)),
    ("q40_cube",             q40 _, Some(q40Sql)),
    ("q41_percentiles",      q41 _, Some(q41Sql)),
    ("q42_asof_attribution", q42 _, Some(q42Sql)),
    ("q43_sessionization",   q43 _, Some(q43Sql)),
    ("q44_union_by_name",    q44 _, Some(q44Sql)),
    ("q45_token_topk",       q45 _, Some(q45Sql)),
    ("q46_approx_distinct",  q46 _, Some(q46Sql)),
    ("q47_ann_ivf_topk",     q47 _, Some(q47Sql)),
    ("q49_grouping_sets",    q49 _, Some(q49Sql)),
    ("q50_analytic_windows", q50 _, Some(q50Sql)),
    ("q51_centroid_udaf",    q51 _, Some(q51Sql)),
    ("q52_json_map_agg",     q52 _, Some(q52Sql)),
    ("q53_interval_join",    q53 _, Some(q53Sql)),
    ("q54_topk_per_key_udaf", q54 _, Some(q54Sql)),
    ("q55_sketch_merge",     q55 _, Some(q55Sql)),
    ("q64_salted_join",      q64 _, Some(q64Sql)),
    ("q65_stream_join_twin", q65 _, Some(q65Sql)),
    ("q67_session_window",   q67 _, Some(q67Sql)),
    ("q68_range_theta_join", q68 _, Some(q68Sql)),
    ("q69_topk_native",      q69 _, Some(q69Sql)),
    ("q76_merge_upsert",     q76 _, Some(q76Sql)),
    ("q77_sliding_window",   q77 _, Some(q77Sql)),
    ("q80_full_outer_join",  q80 _, Some(q80Sql)),
    ("q82_skew_report",      q82 _, Some(q82Sql)),
    ("q83_approx_percentile", q83 _, Some(q83Sql)),
    ("q85_vector_index_topk", q85 _, Some(q47Sql)),
    ("q91_profile_report",   q91 _, Some(q91Sql)),
    ("q96_stream_left_join_twin", q96 _, Some(q96Sql)),
    ("q98_zorder_stats",     q98 _, Some(q98Sql)),
    ("q103_scd2_history",    q103 _, Some(q103Sql)),
    ("q105_incremental_agg", q105 _, Some(q105Sql)),
    ("q108_expectations",    q108 _, Some(q108Sql)),
    ("q109_cohort_retention", q109 _, Some(q109Sql)),
    ("q110_funnel_steps",    q110 _, Some(q110Sql)),
    ("q111_decayed_engagement", q111 _, Some(q111Sql)),
    ("q117_trade_pagerank",  q117 _, Some(q117Sql)),
    ("q120_session_cooccurrence", q120 _, Some(q120Sql)),
    ("q131_conversation_assembly", q131 _, Some(q131Sql)),
    ("q136_trade_hits",      q136 _, Some(q136Sql)),
    ("q141_scd2_pit_lookup", q141 _, Some(q141Sql)),
    ("q148_event_transitions", q148 _, Some(q148Sql)),
    ("q152_trade_triangles", q152 _, Some(q152Sql)),
    ("q165_user_gini",       q165 _, Some(q165Sql)),
    ("q181_fk_integrity",    q181 _, Some(q181Sql)),
    ("q186_quantile_sketch", q186 _, Some(q186Sql)),
    ("q189_layout_skipping", q189 _, Some(q189Sql)),
    ("q194_k_anonymity",     q194 _, Some(q194Sql)),
    ("q197_rendezvous_shards", q197 _, Some(q197Sql)),
    ("q198_column_stats",    q198 _, Some(q198Sql)),
    ("q199_priority_sample", q199 _, Some(q199Sql)),
    ("q200_windowed_outlier", q200 _, Some(q200Sql)),
    ("q202_benford_audit",   q202 _, Some(q202Sql)),
    ("q203_groupwise_ols",   q203 _, Some(q203Sql)),
    ("q204_pareto_frontier", q204 _, Some(q204Sql)),
    ("q205_chisq_independence", q205 _, Some(q205Sql)),
    ("q206_grid_proximity_join", q206 _, Some(q206Sql)),
    ("q207_transition_kappa", q207 _, Some(q207Sql)),
    ("q208_embargo_split",   q208 _, Some(q208Sql)),
    ("q209_monthly_streaks", q209 _, Some(q209Sql)),
    ("q210_weighted_median", q210 _, Some(q210Sql)),
    ("q211_survival_table",  q211 _, Some(q211Sql)),
    ("q212_langmix_tvd",     q212 _, Some(q212Sql)),
    ("q213_ks_drift",        q213 _, Some(q213Sql)),
    ("q214_ranksum_drift",   q214 _, Some(q214Sql)),
    ("q215_kendall_signals", q215 _, Some(q215Sql)),
    ("q216_topk_drift",      q216 _, Some(q216Sql)),
    ("q217_luhn_audit",      q217 _, Some(q217Sql)),
    ("q218_cusum_changepoint", q218 _, Some(q218Sql)),
    ("q219_runs_test",       q219 _, Some(q219Sql)),
    ("q220_importance_weights", q220 _, Some(q220Sql)),
    ("q221_group_variance",  q221 _, Some(q221Sql)),
    ("q222_lag1_autocorr",   q222 _, Some(q222Sql)),
    ("q223_fano_burstiness", q223 _, Some(q223Sql)),
    ("q224_quantile_norm",   q224 _, Some(q224Sql)),
    ("q225_payload_drift",   q225 _, Some(q225Sql)),
    ("q226_emd_drift",       q226 _, Some(q226Sql)),
    ("q227_winsorized_totals", q227 _, Some(q227Sql)),
    ("q228_graph_mixing",    q228 _, Some(q228Sql)),
    ("q229_weekday_profile", q229 _, Some(q229Sql)),
    ("q230_cohort_ltv",      q230 _, Some(q230Sql)),
    ("q231_basket_affinity", q231 _, Some(q231Sql)),
    ("q232_transition_latency", q232 _, Some(q232Sql)),
    ("q233_mad_outliers",    q233 _, Some(q233Sql)),
    ("q234_proportion_ab",   q234 _, Some(q234Sql)),
    ("q235_concentration",   q235 _, Some(q235Sql)),
    ("q236_head_coverage",   q236 _, Some(q236Sql)),
    ("q237_gap_census",      q237 _, Some(q237Sql)),
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
    ("q273_sen_slope",       q273 _, Some(q273Sql)))
}

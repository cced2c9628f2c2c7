package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic fixture tables
  * (`/root/repo/TESTDATA.md`, schemas in `/root/repo/FIXTURES.md`).
  *
  * Each table is a single Parquet file per scale-factor directory; the
  * scan carries explicit column pruning + predicate pushdown courtesy of
  * Catalyst — callers `select`/`filter` and the parquet reader sees
  * `PushedFilters`/`ReadSchema` accordingly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has appeared in two fixture generations: parquet
    * TIMESTAMP(NANOS) — which Spark's vectorized reader rejects, so it
    * is read as raw nanos under the legacy conf and rebuilt with integer
    * `div` (no double round-trip — epoch-nanos exceed double's 2^53
    * exact-integer range) — and plain TIMESTAMP(MICROS), which needs no
    * rewrite. Dispatch on the scanned type so either fixture loads.
    *
    * FOOTPRINT WARNING — the session becomes "nanos-legacy": both confs
    * are SESSION-scoped and intentionally left set after this call (they
    * are consulted again at physical planning, so restoring them here
    * would break the lazy plan this function returns). For every OTHER
    * parquet read in the same session this is invisible EXCEPT two
    * narrow cases: (a) a foreign TIMESTAMP(NANOS) parquet now reads as
    * raw LongType nanos instead of failing outright; (b) a foreign
    * NTZ-annotated (isAdjustedToUTC=false) parquet now reads as
    * TimestampType instead of TimestampNTZType. Micros/UTC parquet —
    * everything Spark itself writes by default, and all other fixture
    * tables — is bit-identical before and after (pinned in
    * EdgeCasesSpec "events conf footprint"). If this engine ever hosts
    * arbitrary foreign reads, gate these sets behind a footprint check.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Micros-generation fixtures annotate ts isAdjustedToUTC=false; read
    // it as plain TimestampType (not TIMESTAMP_NTZ) so downstream
    // unix_millis/window/watermark code sees one timestamp type across
    // fixture generations (session tz is pinned UTC, so same instants).
    if (s.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false")
      s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

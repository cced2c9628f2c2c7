package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-scale fixture generator (round-5 VERDICT item 1).
  *
  * The driver's sf* fixtures are uniform and clean; this main writes a
  * deliberately SKEWED and DIRTY corpus to `target/advdata` so the 100 TB
  * guard rails (LSH `bucketCap`, `saltedJoin`, null-embedding handling,
  * garbage-text tolerance) are exercised against the shapes that actually
  * break large pipelines:
  *
  *  - documents (~65k rows, sf≈1.3 for this table):
  *      50 000 base docs (hash-derived word soup, 20–300 words),
  *      10 000-doc NEAR-DUP FAMILY (one 200-word template, one mutated
  *        word + one unique suffix word each — every member lands in the
  *        same LSH band buckets: the "boilerplate page" hot-bucket case),
  *       5 000 EXACT duplicates (500 base docs × 10 copies),
  *        ~400 dirty rows: NULL / empty / whitespace-only text, 100 kchar
  *        monsters, control-char garbage, NULL lang.
  *  - embeddings (~30k rows): 20 000 hash-uniform vectors (dim 64) plus a
  *      10 000-vector HOT CLUSTER (one anchor ± 1e-4 perturbation — one
  *      IVF cell / one hyperplane bucket), 100 NULL embeddings, 50 zero
  *      vectors (cosine 0/0 = NaN), 50 vectors with a NaN component, 50
  *      wrong-dimension (32) vectors.
  *  - lineitem (3 000 000 rows, sf0.5): l_partkey=1 carries 30% of all
  *      rows (hot join key); the rest spread over 200k keys.
  *  - part (200 001 rows): join target for the hot key.
  *
  * Everything is hash-derived (no RNG state): any row is reproducible
  * from its id alone, on any partitioning, at any parallelism.
  */
object AdvFixture {
  /** Deterministic word list: 2 000 two/three-syllable words; the first
    * 40 are common English function words so language-ID and stopword
    * quality signals have something to detect. */
  private val syll = Array("ka", "lo", "mi", "ta", "re", "su", "no", "vi",
    "ze", "du", "pa", "qu", "ber", "lin", "mos", "tra")
  private val stop = Array("the", "of", "and", "to", "in", "is", "you",
    "that", "it", "he", "was", "for", "on", "are", "as", "with", "his",
    "they", "at", "be", "this", "have", "from", "or", "one", "had", "by",
    "word", "but", "not", "what", "all", "were", "we", "when", "your",
    "can", "said", "there", "use")
  private[graft] val vocab: Array[String] =
    stop ++ (0 until (2000 - stop.length)).map { i =>
      syll(i % 16) + syll((i / 16) % 16) + syll((i / 256) % 16)
    }

  private def vocabLit: Column = typedLit(vocab)

  /** words(idExpr, n): space-joined word sequence, word p chosen by
    * hash(idExpr, p, 17) — pure projection, no shuffle, no RNG. */
  private def words(id: Column, n: Column): Column =
    array_join(transform(sequence(lit(0), n - 1),
      p => element_at(vocabLit, pmod(hash(id, p, lit(17)), lit(vocab.length)) + 1)), " ")

  private def docs(s: SparkSession): DataFrame = {
    val base = s.range(0, 50000).toDF("doc_id")
      .withColumn("text", words(col("doc_id"), lit(20) + pmod(hash(col("doc_id")), lit(280))))
    // near-dup family: one shared 200-word template; per-doc, replace the
    // word at a hashed position and append a doc-unique token. 13-gram
    // shingle overlap stays ~87%+ => est_jaccard clears any 0.5..0.8 gate.
    val family = s.range(100000, 110000).toDF("doc_id")
      .withColumn("tmpl", transform(sequence(lit(0), lit(199)),
        p => element_at(vocabLit, pmod(hash(p, lit(777)), lit(vocab.length)) + 1)))
      .withColumn("pos", pmod(hash(col("doc_id"), lit(1)), lit(200)))
      .withColumn("text", concat(
        array_join(transform(col("tmpl"), (w, i) =>
          when(i === col("pos"),
            element_at(vocabLit, pmod(hash(col("doc_id"), lit(2)), lit(vocab.length)) + 1))
            .otherwise(w)), " "),
        lit(" uniq"), col("doc_id")))
      .select("doc_id", "text")
    // exact duplicates: 10 copies each of base docs 0..499
    val dups = s.range(0, 5000).toDF("i")
      .withColumn("doc_id", col("i") + 120000)
      .withColumn("src", pmod(col("i"), lit(500)))
      .withColumn("text", words(col("src"), lit(20) + pmod(hash(col("src")), lit(280))))
      .select("doc_id", "text")
    val dirty = s.range(0, 400).toDF("i")
      .withColumn("doc_id", col("i") + 130000)
      .withColumn("text",
        when(col("i") < 100, lit(null: String))
          .when(col("i") < 200, lit(""))
          .when(col("i") < 250, lit(" \t\n  \t"))
          .when(col("i") < 300, concat_ws(" ",
            transform(sequence(lit(0), lit(19999)), p =>
              element_at(vocabLit, pmod(hash(col("i"), p), lit(vocab.length)) + 1))))
          .otherwise(repeat(lit(" \ufffd\u202e\u0007 "), 200)))
      .select("doc_id", "text")
    base.unionByName(family).unionByName(dups).unionByName(dirty)
      .withColumn("lang", when(pmod(col("doc_id"), lit(97)) === 0, lit(null: String))
        .otherwise(element_at(typedLit(Array("en", "fr", "de", "es")),
          pmod(hash(col("doc_id"), lit(5)), lit(4)) + 1)))
      .withColumn("source", concat(lit("adv/"),
        pmod(hash(col("doc_id"), lit(7)), lit(20))))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def embeddings(s: SparkSession): DataFrame = {
    def uniform(id: Column, dim: Int, salt: Int): Column =
      transform(sequence(lit(0), lit(dim - 1)),
        i => ((pmod(hash(id, i, lit(salt)), lit(2001)) - 1000) / lit(1000.0)).cast("float"))
    val base = s.range(0, 20000).toDF("vec_id")
      .withColumn("embedding", uniform(col("vec_id"), 64, 11))
    // hot cluster: anchor vector (id-independent) + |ε| <= 1e-4 per
    // coordinate — all 10k land in one IVF cell and one LSH bucket
    val hot = s.range(100000, 110000).toDF("vec_id")
      .withColumn("embedding", transform(sequence(lit(0), lit(63)), i =>
        (((pmod(hash(i, lit(99)), lit(2001)) - 1000) / lit(1000.0)) +
          ((pmod(hash(col("vec_id"), i, lit(13)), lit(21)) - 10) / lit(100000.0))).cast("float")))
    val nulls = s.range(200000, 200100).toDF("vec_id")
      .withColumn("embedding", lit(null).cast("array<float>"))
    val zeros = s.range(200100, 200150).toDF("vec_id")
      .withColumn("embedding", transform(sequence(lit(0), lit(63)), _ => lit(0.0f)))
    val nans = s.range(200150, 200200).toDF("vec_id")
      .withColumn("embedding", transform(sequence(lit(0), lit(63)), i =>
        when(i === 0, lit(Float.NaN)).otherwise(
          ((pmod(hash(col("vec_id"), i, lit(3)), lit(2001)) - 1000) / lit(1000.0)).cast("float"))))
    val short = s.range(200200, 200250).toDF("vec_id")
      .withColumn("embedding", uniform(col("vec_id"), 32, 23))
    base.unionByName(hot).unionByName(nulls).unionByName(zeros)
      .unionByName(nans).unionByName(short)
      .withColumn("label", pmod(hash(col("vec_id"), lit(31)), lit(10)).cast("int"))
  }

  private def lineitem(s: SparkSession): DataFrame =
    s.range(0, 3000000).repartition(32).toDF("id")
      .withColumn("l_orderkey", pmod(hash(col("id"), lit(41)), lit(750000)).cast("long") + 1)
      // 30% of all rows carry partkey 1 — the hot-key join stress
      .withColumn("l_partkey",
        when(pmod(hash(col("id"), lit(43)), lit(10)) < 3, lit(1L))
          .otherwise(pmod(hash(col("id"), lit(47)), lit(200000)).cast("long") + 2))
      .withColumn("l_suppkey", pmod(hash(col("id"), lit(53)), lit(10000)).cast("long") + 1)
      .withColumn("l_linenumber", (pmod(col("id"), lit(7)) + 1).cast("int"))
      .withColumn("l_quantity", (pmod(hash(col("id"), lit(59)), lit(50)) + 1).cast("double"))
      .withColumn("l_extendedprice",
        (pmod(hash(col("id"), lit(61)), lit(90000)) / lit(100.0) + 100.0))
      .withColumn("l_discount", pmod(hash(col("id"), lit(67)), lit(11)) / lit(100.0))
      .withColumn("l_tax", pmod(hash(col("id"), lit(71)), lit(9)) / lit(100.0))
      .withColumn("l_returnflag", element_at(typedLit(Array("A", "N", "R")),
        pmod(hash(col("id"), lit(73)), lit(3)) + 1))
      .withColumn("l_linestatus", element_at(typedLit(Array("F", "O")),
        pmod(hash(col("id"), lit(79)), lit(2)) + 1))
      .withColumn("l_shipdate", timestamp_millis(
        lit(820454400000L) + pmod(hash(col("id"), lit(83)), lit(2500)).cast("long") * 86400000L))
      .drop("id")

  /** Adversarial events (round-7 wave 2): POWER USERS, the shape the
    * uniform fixture never produces. User 1 fires 100 000 events in 20
    * back-to-back 5 000-event sessions (one hour of silence between);
    * user 2 fires 50 000 events with NO gap at all — one mega-session,
    * the sharpest test of q120's claim that per-session state is
    * bounded by |event types|, not by session length. 200 000 more
    * events spread uniformly over 10 000 ordinary users. 8 event
    * types; all hash-derived. */
  private def events(s: SparkSession): DataFrame = {
    val baseMs = 1704067200000L // 2024-01-01T00:00:00Z
    val types = typedLit(Array("view", "click", "scroll", "search",
      "add", "remove", "buy", "share"))
    def ty(id: Column, salt: Int): Column =
      element_at(types, pmod(hash(id, lit(salt)), lit(8)) + 1)
    val power = s.range(0, 100000).toDF("i")
      .select(col("i").as("event_id"), lit(1L).as("user_id"),
        // 45 s spacing, +1 h jump every 5 000 events => 20 long sessions
        timestamp_millis(lit(baseMs) + col("i") * 45000L +
          (col("i") / 5000L).cast("long") * 3600000L +
          pmod(hash(col("i"), lit(5)), lit(30000)).cast("long")).as("ts"),
        ty(col("i"), 19).as("event_type"))
    val mega = s.range(0, 50000).toDF("i")
      .select((col("i") + 1000000L).as("event_id"), lit(2L).as("user_id"),
        timestamp_millis(lit(baseMs) + col("i") * 10000L).as("ts"),
        ty(col("i"), 23).as("event_type"))
    val crowd = s.range(0, 200000).toDF("i")
      .select((col("i") + 2000000L).as("event_id"),
        (pmod(hash(col("i"), lit(29)), lit(10000)).cast("long") + 100L).as("user_id"),
        timestamp_millis(lit(baseMs) +
          pmod(hash(col("i"), lit(31)), lit(2592000)).cast("long") * 1000L).as("ts"),
        ty(col("i"), 37).as("event_type"))
    power.unionByName(mega).unionByName(crowd)
  }

  private def part(s: SparkSession): DataFrame =
    s.range(1, 200002).toDF("p_partkey")
      .withColumn("p_name", concat(lit("part "),
        element_at(vocabLit, pmod(hash(col("p_partkey"), lit(89)), lit(vocab.length)) + 1)))
      .withColumn("p_brand", concat(lit("Brand#"),
        pmod(hash(col("p_partkey"), lit(97)), lit(50))))
      .withColumn("p_type", element_at(typedLit(Array("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")),
        pmod(hash(col("p_partkey"), lit(101)), lit(6)) + 1))
      .withColumn("p_size", (pmod(hash(col("p_partkey"), lit(103)), lit(50)) + 1).cast("int"))
      .withColumn("p_retailprice", pmod(hash(col("p_partkey"), lit(107)), lit(100000)) / lit(100.0))

  def writeAll(s: SparkSession, outDir: String): Unit = {
    docs(s).repartition(16).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(s).repartition(16).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    lineitem(s).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    part(s).repartition(4).write.mode("overwrite").parquet(s"$outDir/part.parquet")
    events(s).repartition(16).write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/advdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-advfixture").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    writeAll(spark, out)
    Tables.names.foreach { n =>
      val p = s"$out/$n.parquet"
      if (new java.io.File(p).exists())
        println(s"ADV_TABLE $n rows=" + spark.read.parquet(p).count())
    }
    spark.stop()
  }
}

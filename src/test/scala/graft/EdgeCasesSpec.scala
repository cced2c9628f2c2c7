package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.RelationalOps

/** Degenerate-input behavior for the dedup/similarity operators —
  * empty frames and single elements must flow through every stage
  * without exceptions (at 100 TB, an empty partition-day or an empty
  * arriving batch is routine, not exceptional).
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val oneDoc =
    Seq(1L -> "a single document with several tokens").toDF("doc_id", "text")

  test("Tables.events surfaces plain TimestampType whatever the fixture generation") {
    // the fixture's physical ts type has already changed once between
    // rounds (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/NTZ, breaking 18
    // bench queries) — pin the loader contract so a third generation
    // fails HERE, not silently in the driver bench
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.events(spark, sf0001)
    ev.schema("ts").dataType shouldBe TimestampType
    // unix_millis is the repo-wide export convention; it must resolve
    val n = ev.select(org.apache.spark.sql.functions.unix_millis(
      org.apache.spark.sql.functions.col("ts"))).where("unix_millis(ts) > 0").count()
    n should be > 0L
  }

  test("events conf footprint: loader's legacy confs leave ordinary parquet reads unaffected") {
    // Tables.events sets nanosAsLong + disables inferTimestampNTZ for
    // the whole session (documented in its scaladoc). Pin the claimed
    // bound of that side effect: a normal micros/UTC timestamp parquet
    // (what Spark itself writes) reads back with identical schema and
    // values before and after the events read (VERDICT r6 item 8).
    import org.apache.spark.sql.types.TimestampType
    val dir = java.nio.file.Files.createTempDirectory("conf-footprint").toString
    val p = s"$dir/plain.parquet"
    Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:30:00")),
        (2L, java.sql.Timestamp.valueOf("2024-03-02 11:45:30")))
      .toDF("id", "t").write.mode("overwrite").parquet(p)
    def snap() = {
      val df = spark.read.parquet(p)
      (df.schema("t").dataType,
       df.select("id", "t").collect().map(_.toString).sorted.toSeq)
    }
    val before = snap()
    Tables.events(spark, sf0001).count() // triggers the conf sets + a real read
    val after = snap()
    before._1 shouldBe TimestampType
    after shouldBe before
  }

  test("minhash pipeline on empty and single-doc corpora") {
    Dedup.minhashSignatures(emptyDocs).count() shouldBe 0
    val pairs = Dedup.minhashCandidatePairs(Dedup.minhashSignatures(oneDoc))
    pairs.count() shouldBe 0 // no self-pairs
    Dedup.dedupByClusters(oneDoc, Dedup.nearDupClusters(pairs)).count() shouldBe 1
  }

  test("incremental dedup with an empty batch and an empty corpus") {
    // empty batch vs real corpus → nothing kept, nothing thrown
    Dedup.dedupIncremental(emptyDocs, oneDoc).count() shouldBe 0
    // real batch vs empty corpus → everything kept (only within-batch dedup)
    Dedup.dedupIncremental(oneDoc, emptyDocs).count() shouldBe 1
  }

  test("similarityJoin with an empty side and with no shared grams") {
    RelationalOps.similarityJoin(
      emptyDocs, "doc_id", "text", oneDoc, "doc_id", "text", 0.1).count() shouldBe 0
    val disjoint = Seq(2L -> "zzz qqq xxx").toDF("doc_id", "text")
    RelationalOps.similarityJoin(
      oneDoc, "doc_id", "text", disjoint, "doc_id", "text", 0.1).count() shouldBe 0
  }

  test("simhash and winnowing on empty-ish text") {
    val weird = Seq(1L -> "", 2L -> " ", 3L -> "ab").toDF("doc_id", "text")
    Dedup.simhash(weird).count() shouldBe 3 // no exceptions, one fp per doc
    weird.select(graft.text.TextFunctions.winnowFingerprints(col("text")).as("fp"))
      .collect().foreach(r => r.getSeq[Long](0).length should be >= 1)
  }

  test("contaminationStats with an empty benchmark and an empty corpus") {
    Dedup.contaminationStats(oneDoc, emptyDocs, n = 3)
      .collect().map(r => (r.getLong(2), r.getBoolean(3))) shouldBe Array((0L, false))
    Dedup.contaminationStats(emptyDocs, oneDoc, n = 3).count() shouldBe 0
  }

  test("repetitionStats and vocab on empty and sub-bigram corpora") {
    graft.text.QualityOps.repetitionStats(emptyDocs).count() shouldBe 0
    val solo = Seq(1L -> "word").toDF("doc_id", "text")
    graft.text.QualityOps.repetitionStats(solo).count() shouldBe 0 // no bigrams → drops
    graft.text.Vocab.encode(solo, graft.text.Vocab.build(solo, 5))
      .collect().map(r => r.getSeq[Int](r.fieldIndex("ids")).toSeq) shouldBe Array(Seq(0))
    graft.text.Vocab.build(emptyDocs, 5).count() shouldBe 0
  }

  test("mergeUpsert with empty base: changelog alone builds the snapshot") {
    val base = Seq.empty[(Long, String)].toDF("k", "v")
    val chg = Seq((1L, "a", 1L, "U"), (1L, "b", 2L, "U"), (2L, "x", 1L, "D"))
      .toDF("k", "v", "ver", "op")
    RelationalOps.mergeUpsert(base, chg, "k", "ver", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))) shouldBe Array((1L, "b"))
  }

  test("CMS heavy hitters on fewer distinct keys than k") {
    graft.functions.CountMin.heavyHitters(
      Seq("a", "a", "b").toDF("k"), "k", k = 10).count() shouldBe 2
  }

  test("CMS heavy hitters on a BIGINT key column (ADVICE r3 #3: estimate UDF " +
      "was String-typed and threw on integral keys)") {
    val df = (Seq.fill(20)(7L) ++ Seq.fill(5)(9L) ++ Seq(1L, 2L)).toDF("user_id")
    val out = graft.functions.CountMin.heavyHitters(df, "user_id", k = 2).collect()
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((7L, 20L), (9L, 5L))
    all(out.map(_.getBoolean(2))) shouldBe true
    all(out.map(_.getBoolean(3))) shouldBe true
  }

  test("HyperplaneBuckets dimension contract: exact-dim vectors match the HOF " +
      "bit for bit; null / empty / wrong-length vectors are NULL, not hot-bucketed") {
    import org.apache.spark.sql.GraftSqlShim
    val lsh = new graft.sim.RandomHyperplaneLsh(dim = 4, planes = 3)
    val signs = Array(lsh.hyperplanes.map(_.toArray).toArray)
    val df = Seq(
      (1L, Some(Seq(1f, 2f, 3f, 4f))),    // well-formed: HOF parity
      (2L, Some(Seq.empty[Float])),       // empty → malformed
      (3L, None),                         // null array
      (4L, Some(Seq(1f, 2f))),            // shorter than dim → malformed
      (5L, Some(Seq(1f, 2f, 3f, 4f, 5f))) // longer than dim → malformed
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), GraftSqlShim.column(graft.sim.HyperplaneBuckets(
        GraftSqlShim.expression(col("embedding")), signs)).as("b"))
      .orderBy("vec_id").collect()
    val viaHof = df.select(col("vec_id"),
        org.apache.spark.sql.functions.array(lsh.bucket(col("embedding"))).as("b"))
      .orderBy("vec_id").collect()
    // the well-formed row: bit-identical to the HOF
    out(0).getSeq[Int](1) shouldBe viaHof(0).getSeq[Int](1)
    // every malformed shape (null, empty, short, long): the HOF's
    // when(dot > 0, ...).otherwise(0) swallows the null-padded dot and
    // lands the row in bucket 0 of every table — a garbage hot bucket
    // that would pair malformed vectors with each other at scale. The
    // native expression returns NULL instead, and the banding
    // posexplode drops the row — the behavior the operator wants.
    for (i <- Seq(1, 2, 3, 4)) {
      viaHof(i).getSeq[Int](1) shouldBe Seq(0)
      out(i).isNullAt(1) shouldBe true
    }
  }

  test("IVF-PQ search when the probed cells hold fewer candidates than k") {
    // 16 one-hot (orthogonal) vectors → vector i assigns to cell i.
    // Query 0 probes nProbe=2 cells (its own + the lowest tied cell);
    // cell 0 holds only the query itself (excluded) and cell 1 holds
    // one vector → exactly 1 result row, no padding, no error.
    val vecs = (0L until 16L).map(i =>
        i -> Seq.tabulate(64)(j => if (j == i.toInt) 1f else 0f))
      .toDF("vec_id", "embedding")
    val out = new graft.sim.PqIndex(64, 8, 16)
      .annTopKIvf(vecs, vecs.where(col("vec_id") === 0L), k = 50,
        new graft.sim.IvfIndex(nCells = 16, nProbe = 2))
    out.count() shouldBe 1L
  }

  test("PQ annTopK with fewer corpus vectors than k neighbors") {
    val vecs = (0L until 16L).map(i => i -> Seq.fill(64)(i.toFloat / 16))
      .toDF("vec_id", "embedding")
    val out = new graft.sim.PqIndex(64, 8, 16)
      .annTopK(vecs, vecs.where(col("vec_id") === 0L), k = 50)
    out.count() shouldBe 15 // all non-self neighbors, no padding, no error
  }
  test("q272 trending gate survives a 6,000-day series (ADVICE r11: 180000·u² wrapped BIGINT)") {
    // Two-level daily counts: days 0..2999 see 1 event, days 3000..5999
    // see 2. Within-half pairs are ties (sgn = 0), so S = 3000·3000 =
    // 9·10⁶ — and 180000·(S−1)² ≈ 1.46·10¹⁹ exceeds Long.Max, so the old
    // all-BIGINT gate wrapped negative and reported trending = false for
    // a monotone 16-year drift (DuckDB errored instead — engine and
    // oracle diverged). The DECIMAL(38,0)/HUGEINT clearing keeps both
    // exact; this pins the fixed answer on the wrapping domain.
    val u = 9000000L - 1 // |S| − 1 after the continuity correction
    (180000L * u * u) should be < 0L // the wrap the fix removes
    val dir = java.nio.file.Files.createTempDirectory("mk-overflow").toString
    spark.range(9000).selectExpr(
        "'drift' AS event_type",
        "CAST(date_add(DATE'2000-01-01', CAST(CASE WHEN id < 3000 THEN id " +
          "ELSE 3000 + (id - 3000) DIV 2 END AS INT)) AS TIMESTAMP) AS ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q272_mann_kendall")(spark, dir).collect()
    out.length shouldBe 1
    val r = out(0)
    r.getAs[Long]("n_days") shouldBe 6000L
    r.getAs[Long]("s_stat") shouldBe 9000000L
    // var18 = n(n−1)(2n+5) − 2·[3000·2999·6005] = 324,054,000,000
    r.getAs[Long]("var18") shouldBe 324054000000L
    r.getAs[Boolean]("trending") shouldBe true
    r.getAs[Long]("direction") shouldBe 1L
  }

  test("ShufflePolicy: partitions scale with the fixture's sf, floored at thread count") {
    ShufflePolicy.sfOf("/root/testdata/sf0.1") shouldBe Some(0.1)
    ShufflePolicy.sfOf("target/sf1") shouldBe Some(1.0)
    ShufflePolicy.sfOf("/data/nothing") shouldBe None
    ShufflePolicy.partitionsFor("/root/testdata/sf0.01", 32) shouldBe 32
    ShufflePolicy.partitionsFor("/root/testdata/sf0.1", 32) shouldBe 32
    ShufflePolicy.partitionsFor("target/sf1", 32) shouldBe 128
    ShufflePolicy.partitionsFor("/x/sf10", 32) shouldBe 1280
    ShufflePolicy.partitionsFor("/x/unnamed", 32) shouldBe 32
  }

  test("q281 fertility on an empty-text stratum: zero pretokens yield NULL, not an error") {
    // an all-empty stratum has ws = 1 per doc (split of '' is ['']) but
    // ZERO pretokens — the chars-per-pretoken ratio must come out NULL
    // through the integer div (Spark) / NULLIF (DuckDB), never a
    // divide-by-zero, and fertility must be exactly 0
    val dir = java.nio.file.Files.createTempDirectory("fert-empty").toString
    spark.range(3).selectExpr("id AS doc_id", "'xx' AS lang", "'void' AS source",
        "'' AS text")
      .unionAll(spark.range(2).selectExpr("id + 10 AS doc_id", "'en' AS lang",
        "'ok' AS source", "'alpha beta' AS text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q281_bpe_fertility")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val v = out("void")
    v.getAs[Long]("n_words") shouldBe 3L
    v.getAs[Long]("n_pretokens") shouldBe 0L
    v.getAs[Long]("fertility_milli") shouldBe 0L
    v.isNullAt(v.fieldIndex("chars_per_pretoken_milli")) shouldBe true
    out("ok").getAs[Long]("fertility_milli") shouldBe 1000L
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.RelationalOps
import graft.ref.Sources

/** Scale-mechanics operators: salted skew join and partitioned layout
  * with partition pruning.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join row-for-row") {
    val big = Tables.load(spark, sf0001, "lineitem").select("l_partkey", "l_orderkey", "l_quantity")
    val small = Tables.load(spark, sf0001, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_name"))
    val plain = big.join(small, Seq("l_partkey"))
    val salted = RelationalOps.saltedJoin(big, small, "l_partkey", salt = 4)
    salted.count() shouldBe plain.count()
    // spot-check content equality via symmetric difference
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  test("saltedJoin spreads a hot key over shards") {
    val big = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val small = Seq(("hot", "dim")).toDF("k", "name")
    val salted = big.withColumn("__shard",
      pmod(hash(struct(big.columns.map(col): _*)), lit(8)))
    salted.select("__shard").distinct().count() should be > 1L
    RelationalOps.saltedJoin(big, small, "k", salt = 8).count() shouldBe 1000
  }

  test("intervalJoin equals the naive theta join on fixture events") {
    val ev = Tables.events(spark, sf0001)
    val a = ev.select(col("user_id"), col("event_id").as("e_a"), col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("e_b"), col("ts").as("ts_b"))
    val bucketed = RelationalOps.intervalJoin(a, b, Seq("user_id"), "ts_a", "ts_b", 300000L)
      .select("user_id", "e_a", "e_b")
    val theta = a.join(b, Seq("user_id"))
      .where(abs(unix_millis(col("ts_a")) - unix_millis(col("ts_b"))) <= 300000L)
      .select("user_id", "e_a", "e_b")
    bucketed.count() shouldBe theta.count()
    bucketed.exceptAll(theta).count() shouldBe 0
  }

  test("partitioned write + partition-pruned read") {
    val dir = Files.createTempDirectory("part-layout").toString + "/orders"
    val orders = Tables.load(spark, sf0001, "orders")
    Sources.writePartitioned(orders, dir, Seq("o_orderstatus"))
    // layout: one directory per status value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    all(dirs) should startWith("o_orderstatus=")
    // a predicate on the partition column prunes at planning time
    val pruned = spark.read.parquet(dir).where(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("o_orderstatus")
    pruned.count() shouldBe orders.where(col("o_orderstatus") === "F").count()
  }

  test("runtime bloom-filter join pruning: a selective dim injects a bloom filter into the fact scan side") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bloom").toString
    Tables.load(spark, sf0001, "lineitem").write.parquet(s"$dir/fact")
    Tables.load(spark, sf0001, "orders").write.parquet(s"$dir/dim")
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // fixture-sized thresholds: dim small enough to build from, fact
      // "large" enough to be worth filtering, broadcast disabled so the
      // join actually shuffles (bloom pruning targets shuffle joins)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("o_orderstatus") === "F")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      optimized.toLowerCase should include("bloom")
      joined.count() should be > 0L
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact at runtime") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dpp-layout").toString + "/orders"
    Sources.writePartitioned(Tables.load(spark, sf0001, "orders"), dir, Seq("o_orderstatus"))
    val fact = spark.read.parquet(dir)
    // tiny on-disk dim carrying the selective predicate — only via the
    // JOIN can the fact learn which partitions matter. (An in-memory
    // Seq dim gets constant-folded into a LocalRelation before the
    // PartitionPruning rule looks for its filter, so DPP would not
    // trigger — the on-disk dim is also the realistic shape.)
    val dimPath = Files.createTempDirectory("dpp-dim").toString + "/dim"
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).where(col("label") === "finished")
    val joined = fact.join(dim, fact("o_orderstatus") === dim("status"))
    val planned = joined.queryExecution.executedPlan.toString
    // the fact scan must carry a runtime (dynamic) partition filter,
    // not read all partitions and filter after the join
    planned.toLowerCase should include("dynamicpruning")
    joined.count() shouldBe
      Tables.load(spark, sf0001, "orders").where(col("o_orderstatus") === "F").count()
  }

  test("compactParquet: many small files become few, contents identical") {
    import graft.ops.Maintenance
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val o = Tables.orders(spark, sf0001)
    o.repartition(24).write.parquet(dir) // 24 shards of a ~1500-row table
    val before = o.collect().map(_.toString).sorted

    val stats = Maintenance.compactParquet(spark, dir, targetBytes = 1L << 30)
    stats.filesBefore shouldBe 24
    stats.filesAfter shouldBe 1
    stats.rows shouldBe before.length

    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    after shouldBe before
    // no leftover staging/old directories
    new java.io.File(dir + ".compact").exists() shouldBe false
    new java.io.File(dir + ".old").exists() shouldBe false
  }

  test("writeClustered: row-group stats let a pushed filter skip most of the data") {
    import graft.ops.Maintenance
    val base = java.nio.file.Files.createTempDirectory("cluster").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.01").select("event_id", "user_id", "value")

    // tiny row groups so the small fixture spans many of them
    ev.repartition(1).write.option("parquet.block.size", (32 * 1024).toString)
      .parquet(s"$base/unsorted")
    Maintenance.writeClustered(ev.repartition(1), s"$base/clustered",
      Seq("user_id"), rowGroupBytes = 32 * 1024)

    def scannedRows(dir: String): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.read.parquet(dir).where(col("user_id") === 7L)
        df.queryExecution.toRdd.count()
        val scan = df.queryExecution.executedPlan.collectLeaves().head
        scan.metrics("numOutputRows").value
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    val un = scannedRows(s"$base/unsorted")
    val cl = scannedRows(s"$base/clustered")
    // same answer either way
    spark.read.parquet(s"$base/clustered").where(col("user_id") === 7L).count() shouldBe
      spark.read.parquet(s"$base/unsorted").where(col("user_id") === 7L).count()
    // clustering must skip most row groups; unsorted reads ~everything
    withClue(s"unsorted=$un clustered=$cl") {
      cl.toDouble should be < un.toDouble / 4
    }
  }

  test("writeZOrdered: row-group skipping works for predicates on EITHER z column") {
    import graft.ops.Maintenance
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

    ev2dir(li, s"$base/unsorted")
    Maintenance.writeClustered(li.repartition(1), s"$base/bypart",
      Seq("l_partkey"), rowGroupBytes = 32 * 1024)
    Maintenance.writeZOrdered(li.repartition(1), s"$base/zorder",
      "l_partkey", "l_suppkey", bits = 16, rowGroupBytes = 32 * 1024)

    def scanned(dir: String, pred: org.apache.spark.sql.Column): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.read.parquet(dir).where(pred)
        df.queryExecution.toRdd.count()
        val scan = df.queryExecution.executedPlan.collectLeaves().head
        scan.metrics("numOutputRows").value
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    val partPred = col("l_partkey") === 42L
    val suppPred = col("l_suppkey") === 7L
    // answers identical across layouts
    spark.read.parquet(s"$base/zorder").where(partPred).count() shouldBe
      spark.read.parquet(s"$base/unsorted").where(partPred).count()
    spark.read.parquet(s"$base/zorder").where(suppPred).count() shouldBe
      spark.read.parquet(s"$base/unsorted").where(suppPred).count()

    // the one-column clustering only helps its own column: on the
    // OTHER column's predicate it reads ~everything, the z-order
    // layout skips most row groups on BOTH single-column predicates
    val zPart = scanned(s"$base/zorder", partPred)
    val zSupp = scanned(s"$base/zorder", suppPred)
    val byPartOnSupp = scanned(s"$base/bypart", suppPred)
    val unPart = scanned(s"$base/unsorted", partPred)
    withClue(s"zPart=$zPart unPart=$unPart zSupp=$zSupp byPartOnSupp=$byPartOnSupp") {
      zPart.toDouble should be < unPart.toDouble / 2
      zSupp.toDouble should be < byPartOnSupp.toDouble / 2
    }
  }

  test("ZValue native expression: matches zValue2 builtin fold and the scalar kernel") {
    import spark.implicits._
    import graft.ops.{Maintenance, ZOrder}
    // q189's expression (real doGenCode) against the q98 builtin-fold
    // twin — two independent constructions of the Morton interleave
    val coords = spark.range(0, 4096)
      .select((col("id") % 64).cast("int").as("a"),
              (col("id") / 64).cast("int").as("b"))
    val both = coords.select(col("a"), col("b"),
      ZOrder.zvalue(col("a"), col("b"), bits = 6).as("native"),
      Maintenance.zValue2(col("a").cast("long"), col("b").cast("long"), bits = 6)
        .as("builtin"))
    both.where(col("native") =!= col("builtin")).count() shouldBe 0L
    // scalar kernel spot pins: interleave of all-ones and identity bits
    ZOrder.zEval(0, 0, 8) shouldBe 0L
    ZOrder.zEval(255, 0, 8) shouldBe 0x5555L
    ZOrder.zEval(0, 255, 8) shouldBe 0xAAAAL
    ZOrder.zEval(255, 255, 8) shouldBe 0xFFFFL
    ZOrder.zEval(1, 0, 1) shouldBe 1L
    // z curve is monotone under the prefix-bucket grouping q189 uses:
    // same (a>>2, b>>2) cell => same z>>4 bucket
    val cells = coords.select(
      (shiftright(ZOrder.zvalue(col("a"), col("b"), 6), 4)).as("zbkt"),
      shiftright(col("a"), 2).as("ca"), shiftright(col("b"), 2).as("cb"))
      .distinct()
    cells.groupBy("ca", "cb").agg(countDistinct("zbkt").as("nb"))
      .where(col("nb") =!= 1).count() shouldBe 0L
  }

  test("mergePartitioned: COW merge rewrites only touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cow").resolve("t").toString
    // partitions p=0..3, three keys each
    val base = (0L until 12L).map(k => (k, k % 4, s"v$k")).toDF("k", "p", "payload")
    base.write.partitionBy("p").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafFiles(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$p"))
      .filter(_.isFile).map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).sorted

    val p0Before = leafFiles("p=0")
    val p3Before = leafFiles("p=3")

    val changes = Seq(
      (1L, 1L, "v1-new", 1L, "U"),   // update key 1 in p=1
      (100L, 1L, "v100", 1L, "U"),   // insert new key into p=1
      (2L, 2L, null, 1L, "D"),       // delete ALL of p=2 (keys 2, 6, 10)
      (6L, 2L, null, 1L, "D"),
      (10L, 2L, null, 1L, "D"),
      (200L, 4L, "v200", 1L, "U"))   // brand-new partition p=4
      .toDF("k", "p", "payload", "version", "op")

    val stats = graft.ops.Maintenance.mergePartitioned(
      spark, dir, changes, partCol = "p", key = "k")
    stats.touched.toSet shouldBe Set("1", "2", "4")
    stats.rewritten shouldBe Seq("p=1", "p=4")
    stats.removed shouldBe Seq("2")

    // untouched partitions: files byte-identical (same name, size, mtime)
    leafFiles("p=0") shouldBe p0Before
    leafFiles("p=3") shouldBe p3Before
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/p=2")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir.merge")) shouldBe false

    // read-back equals the full-table merge computed in memory
    val expect = RelationalOps.mergeUpsert(base, changes, "k", "version", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val got = spark.read.parquet(dir)
      .select(col("k"), col("p").cast("long"), col("payload"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    got.toSeq shouldBe expect.toSeq
  }

  test("mergePartitioned: escaped string partition values survive removal matching") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cow2").resolve("t").toString
    Seq((1L, "a b", "x"), (2L, "c", "y")).toDF("k", "p", "payload")
      .write.partitionBy("p").parquet(dir)
    val changes = Seq((1L, "a b", null: String, 1L, "D"))
      .toDF("k", "p", "payload", "version", "op")
    val stats = graft.ops.Maintenance.mergePartitioned(
      spark, dir, changes, partCol = "p", key = "k")
    stats.removed shouldBe Seq("a b")
    spark.read.parquet(dir).select("k").as[Long].collect().toSeq shouldBe Seq(2L)
  }

  private def ev2dir(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.repartition(1).write.option("parquet.block.size", (32 * 1024).toString)
      .parquet(dir)

  test("q154 fixed-point sufficient statistics agree with the r7 ordered fold at fixture scale") {
    // r8 replaced q154's 1-row sort_array(collect_list) over the whole
    // scored-pair frame (executor OOM at corpus scale) with
    // DECIMAL(38,0) sums of 9-decimal fixed-point integers. The
    // fixed-point means may differ from the old ordered-fold fp means
    // by at most the quantization (1e-9 per pair, so < 1e-9 on the
    // mean) — pin that bound, and pin the exact integer outputs
    // (n_pairs, n_over) EQUAL.
    val row = SparkEntry.queries("q154_minhash_calibration")(spark, sf0001).collect().head
    val nPairs = row.getAs[Long]("n_pairs")
    nPairs should be > 0L
    // reference: the r7 formulation, reconstructed inline over the
    // same scored-pair frame via an ordered driver-side fold
    val pairs = graft.dedup.Dedup.minhashCandidatePairs(
      graft.dedup.Dedup.minhashSignatures(Tables.documents(spark, sf0001), k = 32),
      bands = 4, rowsPerBand = 8, minEst = 0.7)
    val tk = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .distinct()
    val sz = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs.select(col("doc_a"), col("doc_b"))
      .join(tk.select(col("doc_id").as("doc_a"), col("tok")), Seq("doc_a"))
      .join(tk.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val scored = pairs.join(inter, Seq("doc_a", "doc_b"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")).as("exact"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"), r.getAs[Double]("exact")))
      .sortBy(p => (p._1, p._2))
    nPairs shouldBe scored.length.toLong
    row.getAs[Long]("n_over") shouldBe scored.count(p => p._3 > p._4).toLong
    math.abs(row.getAs[Double]("mean_exact") - scored.map(_._4).sum / scored.length) should be < 1e-9
    math.abs(row.getAs[Double]("mean_est") - scored.map(_._3).sum / scored.length) should be < 1e-9
    val mae = scored.map(p => math.abs(p._3 - p._4)).sum / scored.length
    math.abs(row.getAs[Double]("mae") - mae) should be < 1e-9
  }

  test("q175 fixed-point normalizer agrees with the r7 ordered fold at fixture scale") {
    // Same r8 scale-safety rewrite as q154: Z is now a DECIMAL sum of
    // floor(w·1e6) instead of a whole-vocabulary ordered fold in one
    // row. |Z_new − Z_old| ≤ |vocab|·1e-6; probs shift accordingly.
    val out = SparkEntry.queries("q175_negative_sampling")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("tok"), r.getAs[Double]("weight"), r.getAs[Double]("prob")))
    out.length should be > 10 // sf0.001 vocabulary is ~31 tokens
    val zOld = out.map(_._2).sorted.sum // ordered fold, ascending weights
    val zNew = out.head._2 / out.head._3 // implied normalizer
    math.abs(zNew - zOld) should be <= (out.length.toDouble * 1e-6 + 1e-6)
    // probabilities still sum to ~1 under the quantized normalizer
    math.abs(out.map(_._3).sum - 1.0) should be < 1e-6
  }
}

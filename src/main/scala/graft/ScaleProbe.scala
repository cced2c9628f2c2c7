package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale probe (VERDICT r9 #5): one empirical data point behind the
  * 100× design claims. Derives an sf1 fixture set from the driver's
  * sf0.1 tables (10× replication, see below), runs the ten heaviest
  * battery queries at both scales, and records the per-query scaling
  * exponent log10(t_sf1 / t_sf0.1) — 1.0 is perfectly linear in data
  * volume; anything clearly above ~1.2 is a superlinear operator that
  * needs a fix or a documented reason.
  *
  * Derivation methodology (documented for the README table):
  *   - FACT/corpus tables scale 10× (lineitem, orders, events,
  *     documents, embeddings); DIMENSION tables stay fixed (customer,
  *     supplier, part, nation, region) — they are the broadcast side
  *     at any scale, so holding them fixed matches the cluster posture
  *     and keeps every FK in range.
  *   - Keys remap per replica r as `key + r * (max+1)`, preserving the
  *     per-replica id structure exactly (doc_id % 20 batch splits etc.
  *     keep their selectivity).
  *   - documents.text gets a replica-disjoint vocabulary (every token
  *     suffixed with the replica tag for r > 0): minhash/PPJoin token
  *     sets are DISJOINT across replicas, so sf1 behaves as 10
  *     independent sf0.1 corpora — duplicate-FAMILY COUNT scales 10×
  *     while family SIZE stays constant. That is the scaling shape of
  *     a real growing corpus; naive replication (unperturbed text)
  *     would instead fuse replicas into 10×-sized families and blow
  *     candidate-pair counts up ~100×, probing a different problem.
  *   - embeddings rotate dimensions per replica (a cyclic permutation
  *     of the vector): norms and within-replica geometry are
  *     preserved, cross-replica cosine decorrelates.
  *   - events remap event_id/user_id, keep ts: per-user event volume
  *     and window density stay constant, user count scales 10×.
  *
  * Timing methodology matches Bench (compiled plan via toRdd.count,
  * caches cleared between runs): min of 2 at sf0.1; single timed run
  * at sf1 after an untimed global session warmup — the sf1 corpus is
  * 10× the work, a second iteration would double a ~10 min probe for
  * noise the exponent's 0.1-granularity read does not need.
  *
  * Builder tool — the driver never runs this. Output: one JSON line +
  * SCALE_PROBE.json in the repo root.
  */
object ScaleProbe {

  private val heavy = Seq(
    "q196_ppjoin_exact", "q95_dup_graph_degrees", "q60_curation_pipeline",
    "q48_neardup_dedup", "q57_incremental_dedup", "q86_sig_index_probe",
    "q183_syndication_communities", "q164_dupgraph_transitivity",
    "q136_trade_hits", "q154_minhash_calibration",
    // round-12 addition: the exact-substring span census — the gram
    // shuffle is the volume term, so its exponent is the design claim
    "q277_dup_spans",
    // round-13 additions (VERDICT r12 #5): the span family's heavy
    // REWRITE member and the standing-index probe leg
    "q282_span_scrub", "q283_gram_index_probe",
    // round-14 additions (VERDICT r13 #6): the gram-family heavies whose
    // skew guards were claims without measured exponents — q289's
    // breadth-capped attribution join and q290's |S|-bounded pair join —
    // plus the index-SERVED affinity twin (probe leg only; build untimed)
    "q289_leak_attribution", "q290_source_span_affinity",
    "q292_index_span_affinity",
    // round-14: index-served source attribution — probe leg only (build
    // untimed); shard and corpus both scale with sf, so ≤1.0 says the
    // semi-restricted stats join and capped fan-out hold at volume
    "q296_index_leak_sources",
    // round-15 (VERDICT r14 #4/#5/#8): the three new retraction/ANALYZE
    // serves — probe legs only (build+retract untimed). ≤1.0 says the
    // post-takedown read paths (anti-join + bucket-pruned df correction;
    // tombstone anti-join on the ADC scan; per-value merge + prefix-scan
    // histogram) stay ∝ data under 10-30× volume
    "q301_text_retract_probe", "q302_pq_retract_probe",
    "q303_incremental_analyze",
    // round-16 (VERDICT r15 #3/#5): the signature-index takedown probe —
    // the one standing-index serve with no committed probe row — and the
    // advisor served from the standing stats index
    "q300_sig_retract_probe", "q304_statsidx_advisor",
    // round-16 cont.: the standing-MV serves — probe legs only (build+
    // retract untimed). The MV base is O(live groups), so the serve
    // should be near scale-FLAT: group count is fixed by the domain
    // while the corpus grows; q309 additionally pins that the
    // maintenance joins (already folded into segments) never leak into
    // the serve
    "q308_mv_incremental_serve", "q309_mv_join_delta")

  /** VERDICT r11 #1: the two heaviest quadratic-risk queries also get an
    * sf3 rung so their exponent is a least-squares fit across three
    * scales spanning 1.5 decades, not a single two-point ratio.
    * r12 #5 adds the span family's two committed-exponent gaps.
    */
  private val sf3Queries = Set("q196_ppjoin_exact", "q164_dupgraph_transitivity",
    "q282_span_scrub", "q283_gram_index_probe")

  /** Queries that materialize a standing index on FIRST run at a given
    * fixture dir: the build pass is ∝ corpus by design and must not be
    * inside the timed probe (it would read as a fake ~1.0 exponent and
    * mask the probe leg the query exists to measure) — run once
    * untimed per scale, so the timed run serves from the index. */
  private val indexQueries = Set("q283_gram_index_probe", "q292_index_span_affinity",
    "q296_index_leak_sources", "q301_text_retract_probe",
    "q302_pq_retract_probe", "q303_incremental_analyze",
    "q300_sig_retract_probe", "q304_statsidx_advisor",
    "q308_mv_incremental_serve", "q309_mv_join_delta")

  private val factTables = Seq("lineitem", "orders", "events", "documents", "embeddings")
  private val dimTables = Seq("customer", "supplier", "part", "nation", "region")

  def generate(spark: SparkSession, srcDir: String, outDir: String, replicas: Int = 10): Unit = {
    val fs = java.nio.file.Paths.get(outDir)
    if (java.nio.file.Files.exists(fs.resolve("_PROBE_READY"))) {
      println(s"PROBE fixtures already at $outDir — skipping generation")
      return
    }
    java.nio.file.Files.createDirectories(fs)
    dimTables.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

    def replicate(df: DataFrame, perReplica: (DataFrame, Int, Long) => DataFrame,
                  keyCol: String): DataFrame = {
      val span = df.agg(max(col(keyCol))).collect()(0).getLong(0) + 1L
      (0 until replicas).map(r => perReplica(df, r, span)).reduce(_ unionAll _)
    }

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    replicate(docs, (d, r, span) =>
      d.select(
        (col("doc_id") + lit(r.toLong * span)).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"x$r")).as("text"),
        col("lang"), col("source"),
        length(if (r == 0) col("text")
               else regexp_replace(col("text"), "(\\S+)", "$1" + s"x$r"))
          .cast("long").as("n_chars")),
      "doc_id")
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    replicate(embs, (d, r, span) =>
      d.select(
        (col("vec_id") + lit(r.toLong * span)).as("vec_id"),
        (if (r == 0) col("embedding")
         else expr(s"transform(embedding, (x, i) -> element_at(embedding, (CAST((i + $r) AS INT) % size(embedding)) + 1))"))
          .as("embedding"),
        col("label")),
      "vec_id")
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val ev = Tables.events(spark, srcDir)
    val userSpan = ev.agg(max(col("user_id"))).collect()(0).getLong(0) + 1L
    replicate(ev, (d, r, span) =>
      d.select(
        (col("event_id") + lit(r.toLong * span)).as("event_id"), col("ts"),
        (col("user_id") + lit(r.toLong * userSpan)).as("user_id"),
        col("event_type"), col("value"), col("props")),
      "event_id")
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/events.parquet")

    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    val okSpan = ord.agg(max(col("o_orderkey"))).collect()(0).getLong(0) + 1L
    (0 until replicas).map(r =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(r.toLong * okSpan)))
      .reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until replicas).map(r =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r.toLong * okSpan)))
      .reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    java.nio.file.Files.writeString(fs.resolve("_PROBE_READY"), s"replicas=$replicas\n")
    println(s"PROBE fixtures written to $outDir")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // see Bench: decouple shuffle parallelism for scale experiments
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      // This box's hypervisor can stall the whole guest for tens of
      // seconds (the documented bench-drift host); a stalled in-process
      // heartbeater then kills the JVM with exit 56 (HEARTBEAT_FAILURE)
      // mid-probe — measured once during q196's ~17-minute sf3 rung.
      // Liveness detection buys nothing in a single-JVM builder tool:
      // widen the budget so only a real hang dies.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .config("spark.executor.heartbeat.maxFailures", "120")
      .getOrCreate() // heap comes from SPARK_DRIVER_MEM (build.sbt -Xmx)
    spark.sparkContext.setLogLevel("ERROR")

    generate(spark, srcDir, outDir)

    def clearCaches(): Unit = {
      graft.ops.TrackedCache.release(spark)
      spark.sharedState.cacheManager.clearCache()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def once(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      clearCaches(); System.gc()
      // partitions ∝ data PER SCALE (VERDICT r10 #4): the probe's whole
      // point is the data-scaling exponent, so each scale runs at the
      // partition count a deployment would give it — a fixed count
      // across scales measures the harness, not the operator (q196's
      // 1.25-vs-0.94 incident). Runtime-settable SQL conf, so one
      // session probes both scales.
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          ShufflePolicy.partitionsFor(dir, cpus.toInt).toString))
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // untimed session warmup: footers + codegen on a light query
    val qmap = SparkEntry.queries
    once(qmap("q01_agg_sum"), srcDir); once(qmap("q01_agg_sum"), outDir)

    def r3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // SPARK_GRAFT_ONLY=q196_ppjoin_exact → probe only those (local
    // iteration aid for exponent experiments; overwrites SCALE_PROBE.json
    // only when unset so a partial probe can't clobber the full table)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val probed = heavy.filter(n => only.forall(_.contains(n)))

    // sf3 rung fixtures, generated only when one of its queries is probed
    // and SPARK_GRAFT_SF3 != 0 (30 replicas = 3× sf1's data volume).
    val outDir3 = sys.env.getOrElse("SPARK_GRAFT_SF3_DIR", "target/sf3")
    val wantSf3 = sys.env.getOrElse("SPARK_GRAFT_SF3", "1") != "0" &&
      probed.exists(sf3Queries)
    if (wantSf3) generate(spark, srcDir, outDir3, replicas = 30)

    // least-squares slope of log10(t) vs log10(sf) — the scaling exponent
    def fit(pts: Seq[(Double, Double)]): Double = {
      val xs = pts.map(p => math.log10(p._1)); val ys = pts.map(p => math.log10(p._2))
      val n = pts.size; val mx = xs.sum / n; val my = ys.sum / n
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      num / xs.map(x => (x - mx) * (x - mx)).sum
    }

    val rows = probed.map { name =>
      val fn = qmap(name)
      // standing-index queries: untimed first call per scale builds the
      // index, so the timed run measures the PROBE (the sf0.1 min-of-2
      // already had this property implicitly; sf1/sf3 are single runs)
      if (indexQueries(name)) { once(fn, srcDir); once(fn, outDir) }
      val t01 = math.min(once(fn, srcDir), once(fn, srcDir))
      val t1 = once(fn, outDir)
      if (wantSf3 && sf3Queries(name)) {
        if (indexQueries(name)) once(fn, outDir3)
        val t3 = once(fn, outDir3)
        val expn = fit(Seq((0.1, t01), (1.0, t1), (3.0, t3)))
        println(f"PROBE $name%-30s sf0.1 ${t01}%8.3f s   sf1 ${t1}%8.3f s   sf3 ${t3}%8.3f s   exponent(fit) ${expn}%5.2f")
        s""""$name":{"sf01":${r3(t01)},"sf1":${r3(t1)},"sf3":${r3(t3)},"exponent":${r3(expn)},"fit":"lsq3"}"""
      } else {
        val expn = math.log10(t1 / t01)
        println(f"PROBE $name%-30s sf0.1 ${t01}%8.3f s   sf1 ${t1}%8.3f s   exponent ${expn}%5.2f")
        s""""$name":{"sf01":${r3(t01)},"sf1":${r3(t1)},"exponent":${r3(expn)}}"""
      }
    }
    // Sketch-tier STORAGE evidence (VERDICT r15 #6): melt documents'
    // doc_id (high-NDV — one value per row) and lang (low-NDV) into a
    // stats index twice — doc_id exact vs doc_id in the sketch tier —
    // at both scales, and record the _vals row counts. The claim under
    // test: with the tier, _vals growth tracks LOW-NDV columns only
    // (lang's domain + 7 fixed sketch rows), while the exact grain is
    // corpus-sized and scales 10x.
    val tierJson = if (only.nonEmpty) "" else try {
      def meltDocs(dir: String) = Tables.documents(spark, dir)
        .select(explode(array(
          struct(lit("col:doc_id").as("stat_key"),
            col("doc_id").cast("double").as("nv"), lit(null: String).as("sv")),
          struct(lit("col:lang").as("stat_key"),
            lit(null).cast("double").as("nv"), col("lang").as("sv")))).as("r"))
        .select(col("r.stat_key"), col("r.nv"), col("r.sv"))
      val counts = Seq("sf01" -> srcDir, "sf1" -> outDir).map { case (tag, dir) =>
        graft.ops.StatsIndex.write(meltDocs(dir), "probe_tier",
          sketch = Set("col:doc_id"))
        graft.ops.StatsIndex.write(meltDocs(dir), "probe_exact")
        val nT = spark.table("probe_tier_vals").count()
        val nE = spark.table("probe_exact_vals").count()
        s""""${tag}_vals_rows_sketch":$nT,"${tag}_vals_rows_exact":$nE"""
      }
      val j = counts.mkString("\"statsidx_sketch_tier\":{", ",", "},")
      println(s"PROBE statsidx_sketch_tier $j")
      j
    } catch { case e: Throwable =>
      println(s"PROBE statsidx_sketch_tier skipped: ${e.getClass.getSimpleName}"); "" }
    // per-rung replica counts (ADVICE r12 #5): sf1 rows are 10-replica
    // fixtures, sf3 rows 30-replica — the flat "replicas":10 misdescribed
    // the sf3 evidence
    val replicasJson =
      if (wantSf3) "{\"sf1\":10,\"sf3\":30}" else "{\"sf1\":10}"
    val line = rows.mkString("{\"probe\":{", ",", "}," + tierJson + "\"replicas\":" + replicasJson + ",\"src\":\"" + srcDir + "\"}")
    println(line)
    if (only.isEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_PROBE.json"), line + "\n")
      catch { case _: Throwable => () }
    spark.stop()
  }
}

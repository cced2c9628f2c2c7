package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local stage-level profiling harness (builder tool; the driver never
  * runs this). Times named sub-stages of the expensive operators so
  * optimization effort lands where the time actually goes — per-query
  * bench numbers alone can't attribute cost inside a pipeline.
  * Methodology matches Bench: toRdd.count() on the compiled plan,
  * untimed warmup, min of n, caches cleared between runs.
  *
  * The profiled slice rotates with whatever is currently under
  * optimization; earlier rounds' sections (minhash pair decomposition,
  * PQ encode/search split, signature-index probe anatomy) live in git
  * history.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        spark.sharedState.cacheManager.clearCache()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = (1 to 3).map(_ => once()).min
      println(f"PROF $name%-40s $best%8.3f s")
    }

    // q57 incremental-dedup decomposition (round 8: the driver
    // close-out saw 6.4 s vs the 3.05 s recorded mid-round — find
    // where the time actually goes before touching anything)
    import graft.dedup.Dedup
    def docs(): DataFrame = Tables.documents(spark, sfDir)
    def sigs(): DataFrame = Dedup.minhashSignatures(docs(), k = 32)
    def split(): (DataFrame, DataFrame, DataFrame) = {
      val sg = sigs().persist()
      (docs().where(col("doc_id") % 20 === 0),
        sg.where(col("doc_id") % 20 === 0),
        sg.where(col("doc_id") % 20 =!= 0))
    }
    // ---- round 16 slice: decompose the battery's top heavies ----

    // q29 kernel anatomy (the minhash sig+pairs kernel feeds ~15 of
    // the top-30 queries)
    time("k_sigs_native")(sigs())
    time("k_banded") {
      val sg = sigs().persist()
      Dedup.bandedOf(sg, 4, 8)
    }
    def bandedP(): DataFrame = {
      val sg = sigs().persist()
      Dedup.bandedOf(sg, 4, 8).persist()
    }
    time("k_census") {
      bandedP().groupBy("band", "bh")
        .agg(count(lit(1)).as("count"), min("doc_id").as("anchor"))
    }
    time("k_selfjoin_raw") {
      val b = bandedP()
      b.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
        .join(b.select(col("band"), col("bh"), col("doc_id").as("doc_b")), Seq("band", "bh"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
    }
    time("k_selfjoin_distinct") {
      val b = bandedP()
      b.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
        .join(b.select(col("band"), col("bh"), col("doc_id").as("doc_b")), Seq("band", "bh"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    }
    time("k_pairs_full")(Dedup.minhashCandidatePairs(sigs(), 4, 8, 0.7, 1000))
    // verify-phase decomposition: where do the ~1.4 s between
    // selfjoin_distinct (0.60) and pairs_full (2.07) go?
    def distinctPairs(): (DataFrame, DataFrame) = {
      val sg = sigs().persist()
      val b = Dedup.bandedOf(sg, 4, 8)
      val p = b.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
        .join(b.select(col("band"), col("bh"), col("doc_id").as("doc_b")), Seq("band", "bh"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").persist()
      (p, sg)
    }
    time("k_verify_attach_only") { // pairs + two sig joins, no est
      val (p, sg) = distinctPairs()
      p.join(sg.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sg.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .select("doc_a", "doc_b")
    }
    time("k_verify_est") { // + the unrolled 32-way agreement and filter
      val (p, sg) = distinctPairs()
      p.join(sg.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sg.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), Dedup.sigAgreement(32).as("est_jaccard"))
        .where(col("est_jaccard") >= 0.7)
    }
    time("k_verify_est_dedup") { // + the trailing dropDuplicates
      val (p, sg) = distinctPairs()
      p.join(sg.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sg.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), Dedup.sigAgreement(32).as("est_jaccard"))
        .where(col("est_jaccard") >= 0.7)
        .dropDuplicates("doc_a", "doc_b")
    }
    time("q29_registered")(SparkEntry.queries("q29_minhash_lsh_pairs")(spark, sfDir))

    // q136 HITS: edge build vs iteration cost
    def q136Edges(): DataFrame = {
      import org.apache.spark.sql.types.LongType
      val li = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("price"))
      val ord = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.load(spark, sfDir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.load(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"), col("price"))
        .groupBy("src", "dst")
        .agg((sum(col("price")) * lit(10000)).cast(LongType).as("w"))
    }
    time("q136_edges_only")(q136Edges())
    time("q136_hits_cached_edges") {
      val e = q136Edges().persist()
      e.count()
      val nation = Tables.load(spark, sfDir, "nation")
      graft.ops.Graph.hits(e, nation.select("n_nationkey"), iters = 2)
    }
    time("q136_registered")(SparkEntry.queries("q136_trade_hits")(spark, sfDir))

    // q117 pagerank for comparison
    time("q117_registered")(SparkEntry.queries("q117_trade_pagerank")(spark, sfDir))

    // q59 audio: decode alone vs decode+features
    time("q59_decode_only") {
      import spark.implicits._
      graft.multimodal.Multimodal.decodeAudio(
        graft.multimodal.Multimodal.audioFromDocuments(spark, Tables.documents(spark, sfDir)))
        .toDF()
    }
    time("q59_registered")(SparkEntry.queries("q59_audio_features")(spark, sfDir))

    // q196 stage anatomy
    def q196Toks(): DataFrame = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .where(length(col("tok")) > 0).distinct()
    time("q196_alltoks")(q196Toks())
    time("q196_groups") {
      q196Toks().groupBy("doc_id")
        .agg(md5(concat_ws("", sort_array(collect_set(col("tok"))))).as("sig"))
        .groupBy("sig").agg(min(col("doc_id")).as("rep"), count(lit(1)).as("m"))
    }
    time("q196_registered")(SparkEntry.queries("q196_ppjoin_exact")(spark, sfDir))

    // q154: pairs + exact-overlap verification split
    time("q154_registered")(SparkEntry.queries("q154_minhash_calibration")(spark, sfDir))

    // q164 / q183 / q250 / q257: graph stages on minhash pairs
    time("q164_registered")(SparkEntry.queries("q164_dupgraph_transitivity")(spark, sfDir))
    time("q183_registered")(SparkEntry.queries("q183_syndication_communities")(spark, sfDir))
    time("q250_registered")(SparkEntry.queries("q250_kcore_backbone")(spark, sfDir))
    time("q257_registered")(SparkEntry.queries("q257_bfs_reach")(spark, sfDir))
    time("q282_registered")(SparkEntry.queries("q282_span_scrub")(spark, sfDir))
    spark.stop()
  }
}

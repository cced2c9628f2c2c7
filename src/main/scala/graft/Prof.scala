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
    time("q57_sigs_only")(sigs())
    time("q57_vs_corpus_pairs") {
      val (_, ba, co) = split()
      Dedup.minhashCandidatePairsBetween(ba, co, 4, 8, 0.9, 1000, persistInputs = false)
    }
    time("q57_within_batch_pairs") {
      val (_, ba, _) = split()
      Dedup.minhashCandidatePairs(ba, 4, 8, 0.9, 1000)
    }
    time("q57_registered")(SparkEntry.queries("q57_incremental_dedup")(spark, sfDir))
    time("q58_registered")(SparkEntry.queries("q58_cosine_neardup")(spark, sfDir))
    time("q58_pairs_only")(graft.sim.VectorFunctions.cosineNearDupPairs(
      Tables.load(spark, sfDir, "embeddings"), dim = 64, minCos = 0.45))

    // q183 decomposition (round 8: 10.5 s in the battery — where?)
    def q183Edges(): DataFrame = {
      val docsT = Tables.documents(spark, sfDir)
      val pairs = Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docsT, k = 32), bands = 4, rowsPerBand = 8, minEst = 0.5)
      val src = docsT.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
        .where(col("sa") =!= col("sb"))
        .groupBy(col("sa").as("src"), col("sb").as("dst"))
        .agg(count(lit(1)).as("w"))
    }
    time("q183_edges_only")(q183Edges())
    time("q183_lpa_tiny_edges") {
      import spark.implicits._
      val e = (for (a <- 0 until 20; b <- 0 until 20 if a != b)
        yield (s"s$a", s"s$b", 5L)).toDF("src", "dst", "w")
      val n = (0 until 20).map(i => s"s$i").toDF("node")
      graft.ops.Graph.labelPropagation(e, n, iters = 4)
    }
    time("q183_lpa_real_edges") {
      val e = q183Edges().persist()
      val n = Tables.documents(spark, sfDir).select(col("source")).distinct()
      graft.ops.Graph.labelPropagation(e, n, iters = 4)
    }
    time("q183_registered")(SparkEntry.queries("q183_syndication_communities")(spark, sfDir))
    spark.stop()
  }
}

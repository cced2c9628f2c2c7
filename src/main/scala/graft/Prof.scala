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
    spark.stop()
  }
}

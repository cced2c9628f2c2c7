package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Local stage-level profiling harness (builder tool; the driver never
  * runs this). Times named sub-stages of the expensive operators so
  * optimization effort lands where the time actually goes — per-query
  * bench numbers alone can't attribute cost inside a pipeline.
  * Methodology matches Bench: toRdd.count() on the compiled plan,
  * untimed warmup, min of n, caches cleared between runs.
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

    val docs = Tables.documents(spark, sfDir)
    import graft.dedup.Dedup
    time("tokens_explode_only") {
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array_distinct(
            graft.text.TextFunctions.tokens(
              org.apache.spark.sql.functions.col("text")))).as("tok"))
    }
    time("minhash_sigs_k32") { Dedup.minhashSignatures(docs, 32) }
    time("minhash_sigs_native_k32") { Dedup.minhashSignaturesNative(docs, 32) }
    time("q29_full_pairs") {
      Dedup.minhashCandidatePairs(Dedup.minhashSignatures(docs, 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7, bucketCap = 1000)
    }
    // isolate: threshold vs corpus slice
    import org.apache.spark.sql.functions.col
    time("pairs_full_est09") {
      Dedup.minhashCandidatePairs(Dedup.minhashSignatures(docs, 32),
        bands = 4, rowsPerBand = 8, minEst = 0.9, bucketCap = 1000)
    }
    time("pairs_half_est07") {
      Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs.where(col("doc_id") % 10 >= 5), 32),
        bands = 4, rowsPerBand = 8, minEst = 0.7, bucketCap = 1000)
    }
    time("pairs_half_est09") {
      Dedup.minhashCandidatePairs(
        Dedup.minhashSignatures(docs.where(col("doc_id") % 10 >= 5), 32),
        bands = 4, rowsPerBand = 8, minEst = 0.9, bucketCap = 1000)
    }
    // q78 PQ decomposition
    val e = Tables.embeddings(spark, sfDir)
    val pq = new graft.sim.PqIndex(dim = 64, m = 8, ksub = 16)
    val cb = pq.codebookOf(e)
    time("pq_encode_only") { pq.encode(e, cb) }
    time("pq_search_precoded") {
      pq.searchAdc(pq.encode(e, cb), e.where(col("vec_id") < 10), 5, cb)
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: one JSON line with per-query wall times.
  *
  * An untimed warmup pass first touches every fixture table and runs one
  * shuffle+codegen round, so the first timed query doesn't absorb
  * session/codegen/parquet-footer initialization — per-query numbers
  * then reflect steady-state operator cost, which is what the 100 TB
  * posture cares about.
  *
  * Honesty rules, each bought by a real round-1 incident:
  *   - run the COMPILED physical plan (queryExecution.toRdd): a plain
  *     df.count() lets Catalyst prune every projection the query exists
  *     to compute (a per-row fingerprint column benches as a metadata
  *     count), which hid a 100× regression once;
  *   - a query that THROWS is reported as time=-1 plus an "errors"
  *     entry — never as a near-zero "success" that improves the total;
  *   - the cache manager is cleared before every timed iteration:
  *     queries that persist() intermediates (minhash signatures) must
  *     re-earn that work in the timed pass, not read the warmup's cache;
  *   - n>=3 iterations, report min (steady-state) and median (noise
  *     check) — n=1 cannot tell a regression from a GC pause.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""

    def clearCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.catalog.clearCache()
    }

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(160)}")
      }

    val defs = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup (untimed): pays session init, parquet footers, Janino codegen
    defs.foreach { case (_, fn) => run(fn) }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = defs.map { case (name, fn) =>
      val times = (1 to iters).flatMap { _ =>
        clearCaches()
        run(fn) match {
          case Right(t) => Some(t)
          case Left(err) =>
            errors(name) = err
            System.err.println(s"BENCH FAIL $name: $err")
            None
        }
      }
      if (times.isEmpty) name -> (-1.0, -1.0)
      else {
        val sorted = times.sorted
        name -> (sorted.head, sorted(sorted.size / 2))
      }
    }
    val qs = results.map { case (k, (mn, _)) => jstr(k) + ":" + mn }.mkString("{", ",", "}")
    val med = results.map { case (k, (_, md)) => jstr(k) + ":" + md }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // queries added after round 1 (BENCH_r01 = the recorded baseline) —
    // the subtotal over the original 54 keeps round-over-round totals
    // comparable as the query surface grows
    val addedAfterR1 = Set("q55_sketch_merge", "q56_similarity_join",
      "q57_incremental_dedup", "q58_cosine_neardup", "q59_audio_features",
      "q60_curation_pipeline", "q61_media_resize", "q62_stratified_sample",
      "q63_bm25_topk", "q64_salted_join", "q65_stream_join_twin",
      "q66_bpe_token_count", "q67_session_window", "q68_range_theta_join",
      "q69_topk_native", "q70_token_shards", "q71_mixture_sample",
      "q72_dup_ngrams", "q73_redaction", "q74_decontaminate",
      "q75_repetition_quality", "q76_merge_upsert", "q77_sliding_window",
      "q78_pq_ann_topk", "q79_vocab_encode", "q80_full_outer_join")
    val baselineComparable = results
      .filterNot { case (k, _) => addedAfterR1.contains(k) }
      .map(_._2._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":$iters,"baseline_comparable_r1_query_subtotal":$baselineComparable,"queries":$qs,"queries_median":$med,"errors":$errJson,"n_failed":${errors.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}

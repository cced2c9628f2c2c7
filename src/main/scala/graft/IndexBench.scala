package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SignatureIndex}
import graft.sim.{IvfIndex, VectorIndex}
import graft.text.TextIndex

/** STANDING-INDEX steady-state bench (round-7 VERDICT item 7).
  *
  * The per-round Bench probes freshly built indexes; a production
  * pipeline probes an index that has absorbed many appends — each
  * append lands one file per (task × touched bucket/cell), so probe
  * cost degrades with append count until a compaction rewrites the
  * leaves. This main measures that degradation with NUMBERS for all
  * three standing index families:
  *
  *   - [[VectorIndex]]  (cell-partitioned IVF ANN, DPP-pruned probes)
  *   - [[SignatureIndex]] (bucketed minhash LSH, batch-vs-corpus probe)
  *   - [[TextIndex]]    (bucketed BM25 postings, fixed-term probe)
  *
  * Protocol per family: build the base index from the sf fixture, then
  * alternate appends (APPEND_BATCH rows each) with min-of-3 probe
  * timings at checkpoint append counts {0,1,2,4,8,N}, then [[compact]]
  * and probe once more. Output is ONE JSON line
  * `INDEXBENCH {"probe_sec":{"vector_a0":…},"files":{…}}` — the policy
  * trigger is probe(aN)/probe(a0) > 1.5 ⇒ compact (IndexLifecycleSpec's
  * rule, now with a measured curve showing where 1.5 lands).
  *
  * Usage: `runMain graft.IndexBench` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_APPENDS).
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nAppends = sys.env.getOrElse("SPARK_GRAFT_APPENDS", "12").toInt
    val spark = SparkSession.builder()
      .appName("graft-indexbench").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val files = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val checkpoints = (Seq(0, 1, 2, 4, 8) :+ nAppends).distinct.filter(_ <= nAppends)

    // `cleanup` runs BETWEEN iterations, untimed (ADVICE r14 #4: the
    // attribution probe's TrackedCache release used to sit inside the
    // timed region, so its curve paid unpersist cost the scrub curve
    // didn't — the two curves now measure the probe alone)
    def minOf3(body: => Long, cleanup: () => Unit = () => ()): Double =
      (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        body
        val t = (System.nanoTime() - t0) / 1e9
        cleanup()
        t
      }.min

    def countFiles(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      val root = new java.io.File(dir)
      if (root.exists()) walk(root) else 0L
    }

    // ---------------- vector index (cell-partitioned IVF) -------------
    {
      val dir = "target/indexes/ibench_vec"
      def rmRf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmRf)
        f.delete(); ()
      }
      rmRf(new java.io.File(dir))
      val embs = Tables.embeddings(spark, sfDir).persist()
      val n = embs.count()
      val ivf = new IvfIndex(nCells = 16, nProbe = 4)
      val cents = ivf.centroidsOf(embs)
      VectorIndex.write(embs, dir, ivf, cents)
      val queries = embs.where(col("vec_id") < 20).persist()
      queries.count()
      def probe(): Long = VectorIndex.topK(spark, dir, queries, k = 10, ivf).count()
      times("vector_a0") = minOf3(probe())
      for (b <- 1 to nAppends) {
        // a fresh 500-row batch: fixture vectors re-keyed into a new id
        // range (the embedding VALUES being reused is irrelevant to the
        // file-count mechanics under test)
        val batch = embs.where(col("vec_id") >= n - 500)
          .withColumn("vec_id", col("vec_id") + lit(1000000L * b))
        VectorIndex.append(batch, dir, ivf)
        if (checkpoints.contains(b)) times(s"vector_a$b") = minOf3(probe())
      }
      files("vector_precompact") = countFiles(dir)
      VectorIndex.compact(spark, dir)
      files("vector_postcompact") = countFiles(dir)
      times("vector_compacted") = minOf3(probe())
      queries.unpersist(); embs.unpersist()
    }

    // ---------------- signature index (bucketed LSH) -------------------
    {
      val name = "ibench_sig"
      val docs = Tables.documents(spark, sfDir)
      val sigs = Dedup.minhashSignatures(docs, k = 32).persist()
      val nd = sigs.count()
      SignatureIndex.write(sigs, name)
      val batchSigs = sigs.where(col("doc_id") < 200).persist()
      batchSigs.count()
      def probe(): Long = SignatureIndex.probe(spark, batchSigs, name).count()
      times("sig_a0") = minOf3(probe())
      for (b <- 1 to nAppends) {
        val batch = sigs.where(col("doc_id") >= nd - 500)
          .withColumn("doc_id", col("doc_id") + lit(1000000L * b))
        SignatureIndex.append(batch, name)
        if (checkpoints.contains(b)) times(s"sig_a$b") = minOf3(probe())
      }
      SignatureIndex.compact(spark, name)
      times("sig_compacted") = minOf3(probe())
      batchSigs.unpersist(); sigs.unpersist()
    }

    // ---------------- gram index (exact-substring scrub probe) ---------
    // The span-dedup serving path (VERDICT r12 #8): probe = scrubProbe
    // of a FIXED shard while the index absorbs appends — a flat curve
    // is the "probe cost ∝ shard, never corpus" claim with numbers;
    // compact reclaims the append small-files and min-merges owners.
    {
      val name = "ibench_gram"
      val spec = graft.dedup.GramIndex.Spec(minLen = 8, buckets = 64)
      val docs = Tables.documents(spark, sfDir).persist()
      val nd = docs.count()
      graft.dedup.GramIndex.write(docs.where(col("doc_id") % 10 =!= 0), name, spec)
      val shard = docs.where(col("doc_id") % 10 === 0 && col("doc_id") < 2000).persist()
      shard.count()
      def probe(): Long =
        graft.dedup.GramIndex.scrubProbe(spark, shard, name, spec).count()
      // round-14: the attribution probe shares the index — its curve
      // must stay flat under appends for the same reason (stats rows
      // semi-restricted per segment, merged by join fold)
      def attrProbe(): Long = graft.dedup.GramIndex
        .attributeSources(spark, shard, name, spec).count()
      val attrCleanup = () => { graft.ops.TrackedCache.release(spark); () }
      times("gram_a0") = minOf3(probe())
      times("gram_attr_a0") = minOf3(attrProbe(), attrCleanup)
      for (b <- 1 to nAppends) {
        val batch = docs.where(col("doc_id") >= nd - 500)
          .withColumn("doc_id", col("doc_id") + lit(1000000L * b))
        graft.dedup.GramIndex.append(batch, name, spec)
        if (checkpoints.contains(b)) times(s"gram_a$b") = minOf3(probe())
      }
      times(s"gram_attr_a$nAppends") = minOf3(attrProbe(), attrCleanup)
      // Tiered compaction costs (VERDICT r13 #3): the MINOR fold touches
      // only the appended delta segments — its time must track delta
      // size, not corpus size — while the MAJOR fold rewrites the base.
      def timeOnce(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      times("gram_compact_minor_sec") =
        timeOnce(graft.dedup.GramIndex.compactDelta(spark, name, spec))
      times("gram_minor_compacted") = minOf3(probe())
      times("gram_compact_major_sec") =
        timeOnce(graft.dedup.GramIndex.compact(spark, name, spec))
      times("gram_compacted") = minOf3(probe())
      times("gram_attr_compacted") = minOf3(attrProbe(), attrCleanup)
      // the cost-∝-delta claim needs a SMALL delta on the now-LARGER
      // base: two fresh appends onto the fully-compacted index, then a
      // minor fold — its cost must track the 2-append delta, not the
      // (base + 12 appends)-sized corpus the major rewrite above paid
      for (b <- nAppends + 1 to nAppends + 2) {
        val batch = docs.where(col("doc_id") >= nd - 500)
          .withColumn("doc_id", col("doc_id") + lit(1000000L * b))
        graft.dedup.GramIndex.append(batch, name, spec)
      }
      times("gram_compact_minor_small_delta_sec") =
        timeOnce(graft.dedup.GramIndex.compactDelta(spark, name, spec))
      times("gram_small_delta_compacted") = minOf3(probe())
      shard.unpersist(); docs.unpersist()
    }

    // ---------------- text index (bucketed BM25 postings) --------------
    {
      val name = "ibench_text"
      val docs = Tables.documents(spark, sfDir).persist()
      val nd = docs.count()
      TextIndex.write(docs, name)
      val terms = Seq("join", "stream", "vector")
      def probe(): Long = TextIndex.probe(spark, name, terms, k = 20).count()
      times("text_a0") = minOf3(probe())
      for (b <- 1 to nAppends) {
        val batch = docs.where(col("doc_id") >= nd - 500)
          .withColumn("doc_id", col("doc_id") + lit(1000000L * b))
        TextIndex.append(batch, name)
        if (checkpoints.contains(b)) times(s"text_a$b") = minOf3(probe())
      }
      TextIndex.compact(spark, name)
      times("text_compacted") = minOf3(probe())
      docs.unpersist()
    }

    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println("INDEXBENCH {" +
      "\"appends\":" + nAppends + ",\"batch_rows\":500," +
      "\"probe_sec\":" + times.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}") +
      ",\"files\":" + files.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}") + "}")
    spark.stop()
  }
}

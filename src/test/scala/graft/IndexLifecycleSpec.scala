package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SignatureIndex}
import graft.dedup.SignatureIndex.Spec
import graft.sim.{IvfIndex, PqIndex, PqVectorIndex, VectorIndex}

/** Standing-index lifecycle (VERDICT r4 item 5): after N appends the
  * indexes accrete small files (and the PQ quantizer drifts as the
  * corpus shifts). Compaction must shrink files while leaving probe
  * plans AND results bit-identical; the codebook refresh must be gated
  * by measured recall and actually repair it. */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Int = {
    def walk(f: File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new File(dir))
  }

  // ------------------------------------------------- signature index
  test("SignatureIndex.compact: fewer files, identical probe plan shape and results") {
    val spec = Spec(bands = 4, rowsPerBand = 8, buckets = 8)
    def sigsOf(min: Long, max: Long) = Dedup.minhashSignatures(
      Tables.documents(spark, sf0001)
        .where(col("doc_id") >= min && col("doc_id") < max),
      k = spec.bands * spec.rowsPerBand)
    for (t <- Seq("lcyc_banded", "lcyc_sigs", "lcyc_banded_compact", "lcyc_sigs_compact"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    SignatureIndex.write(sigsOf(0, 100), "lcyc", spec)
    SignatureIndex.append(sigsOf(100, 180), "lcyc", spec)
    SignatureIndex.append(sigsOf(180, 250), "lcyc", spec)

    val batch = sigsOf(250, 100000).persist()
    def probeRows = SignatureIndex.probe(spark, batch, "lcyc", spec, minEst = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = probeRows
    before should not be empty

    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val filesBefore = parquetFiles(s"$warehouse/lcyc_banded")

    SignatureIndex.compact(spark, "lcyc", spec)

    val filesAfter = parquetFiles(s"$warehouse/lcyc_banded")
    filesAfter should be < filesBefore
    filesAfter should be <= spec.buckets

    // plan shape: still bucketed scans, still no index-side exchange
    val plan = SignatureIndex.probe(spark, batch, "lcyc", spec, minEst = 0.9)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      "Bucketed: true".r.findAllIn(plan).size should be >= 2
      val capPlan = spark.table("lcyc_banded").groupBy("band", "bh").count()
        .queryExecution.executedPlan.toString
      capPlan.contains("Exchange") shouldBe false
    }
    probeRows shouldBe before
  }

  // ---------------------------------------------------- vector index
  test("VectorIndex.compact: per-cell files collapse, DPP plan and top-k identical") {
    val dir = java.nio.file.Files.createTempDirectory("lcyc-vec").toString + "/idx"
    val ivf = new IvfIndex(nCells = 8, nProbe = 3)
    val e = Tables.embeddings(spark, sf0001)
    val cents = ivf.centroidsOf(e)
    VectorIndex.write(e.where(col("vec_id") % 3 === 0), dir, ivf, cents)
    VectorIndex.append(e.where(col("vec_id") % 3 === 1), dir, ivf)
    VectorIndex.append(e.where(col("vec_id") % 3 === 2), dir, ivf)

    val queries = e.where(col("vec_id") < 5)
    def rows = VectorIndex.topK(spark, dir, queries, 3, ivf)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = rows
    before should not be empty

    val filesBefore = parquetFiles(s"$dir/cells")
    val stats = VectorIndex.compact(spark, dir)
    stats.filesAfter should be < filesBefore
    stats.rows shouldBe e.count()
    parquetFiles(s"$dir/cells") shouldBe stats.filesAfter

    val out = VectorIndex.topK(spark, dir, queries, 3, ivf)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    withClue(plan) { plan.toLowerCase.contains("dynamicpruning") shouldBe true }
    rows shouldBe before
  }

  // ------------------------------------------------ codebook refresh
  test("PqVectorIndex.refreshIfDrifted: healthy index untouched; drifted codebook " +
      "refreshes and recall recovers") {
    // 8 deterministic FAMILIES of 5 near-identical members. Family
    // pattern = a distinct cyclic shift of one ramp, so every family
    // has the SAME norm (dot ranking == cosine ranking — the exact arm
    // scores cosine, ADC scores inner product) and families are far
    // apart while siblings are 1e-4 close: exact top-4 = the 4
    // siblings. Ids are member-major (f + 8j) so the PQ fit's seed rows
    // (vec_id < ksub = 8) span all 8 families — fit converges onto the
    // family patterns and recall is high. The DRIFTED index encodes
    // with a collapsed stale codebook (all sub-centroids ~identical):
    // every vector gets the same codes, ADC ties everywhere, ranking
    // degenerates to neighbor_id order — the measurable endpoint of
    // quantizer drift, deterministic by construction.
    val dim = 16
    def member(f: Int, j: Int): (Long, Seq[Float]) =
      (f + 8L * j, Seq.tabulate(dim) { d =>
        val shifted = (d + 2 * f + 1) % dim
        (shifted - 7.5f) / 4f + (if (d == j % dim) j * 1e-4f else 0f)
      })
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val full = df(for (f <- 0 until 8; j <- 0 until 5) yield member(f, j))
    val queries = df(Seq(member(0, 1), member(1, 2), member(3, 1),
      member(4, 3), member(6, 1), member(7, 2)))
    val dirRoot = java.nio.file.Files.createTempDirectory("lcyc-pq").toString

    val ivf = new IvfIndex(nCells = 4, nProbe = 2)
    val pq = new PqIndex(dim, m = 4, ksub = 8)
    val cents = ivf.fit(full)

    // --- healthy: codebook fitted on the corpus it serves -> no refresh
    PqVectorIndex.write(full, s"$dirRoot/healthy", ivf, cents, pq, pq.fit(full))
    val healthy = PqVectorIndex.refreshIfDrifted(full, queries, s"$dirRoot/healthy",
      k = 4, ivf, pq, minRecall = 0.6)
    withClue(healthy) {
      healthy.refreshed shouldBe false
      healthy.recallBefore should be >= 0.6
      healthy.recallAfter shouldBe healthy.recallBefore
    }

    // --- drifted: the standing codebook no longer separates the corpus
    val stale: Array[Array[Array[Float]]] =
      Array.tabulate(4, 8)((_, c) => Array.fill(dim / 4)(c * 1e-6f))
    PqVectorIndex.write(full, s"$dirRoot/drift", ivf, cents, pq, stale)
    val drifted = PqVectorIndex.refreshIfDrifted(full, queries, s"$dirRoot/drift",
      k = 4, ivf, pq, minRecall = 0.6)
    withClue(drifted) {
      drifted.refreshed shouldBe true
      drifted.recallBefore should be < 0.6
      drifted.recallAfter should be > drifted.recallBefore
      drifted.recallAfter should be >= 0.6
    }
  }
}

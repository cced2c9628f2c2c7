package graft.sim

import graft.ops.TrackedCache.TrackOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding-similarity operators (driver mandate; SURVEY.md §2.11).
  *
  * Dot products / norms are sequential left-to-right double folds over
  * the array (higher-order `aggregate`), so a given row always produces
  * bit-identical results regardless of partitioning — required for the
  * oracle hash-compare and for reproducible runs at scale.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, sequential fold order. Generic over float and
    * double arrays (used for hyperplane projections); the hot
    * embedding-pair path goes through [[cosine]] instead. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Validity predicate for an embedding column: non-null, expected
    * dimension, no NaN components. A zero or NaN vector produces a NaN
    * cosine, and NaN compares GREATER than every real number in Spark's
    * ordering — one dirty corpus row would outrank every true neighbor
    * in a top-k (the adversarial sweep measured 20 NaN rows in 100
    * top-k results on a corpus with 0.3% dirty vectors). Filter corpora
    * through this before indexing / search; the ranking paths also
    * drop NaN scores defensively. */
  def isValidVector(c: Column, dim: Int): Column =
    c.isNotNull && size(c) === dim &&
      !exists(c, x => isnan(x)) && aggregate(c,
        lit(0.0), (acc, v) => acc + abs(v.cast(DoubleType))) > 0.0

  /** Cosine over two `array<float>` columns via the fused codegen
    * [[CosineSimilarity]] expression — one array pass per pair instead
    * of three interpreted ones; bit-identical arithmetic. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      CosineSimilarity(
        org.apache.spark.sql.GraftSqlShim.expression(a),
        org.apache.spark.sql.GraftSqlShim.expression(b)))

  /** Brute-force top-k cosine neighbors of each query vector.
    * The query set is broadcast (it is small by construction); the
    * corpus side streams — a broadcast nested-loop join, no shuffle of
    * the corpus. The per-query top-k window shuffles only
    * |queries|·|corpus| scored rows; at scale, cap it by pre-filtering
    * with [[RandomHyperplaneLsh]] buckets.
    *
    * The cohort bound is part of the CONTRACT, not a hint: `limit`
    * makes the broadcast side's row count statically provable
    * (Catalyst `maxRows`), which is what lets `planLint` distinguish
    * this deliberate bounded-cohort scan from an accidental
    * data-sized nested loop. Cohorts at or under the bound pass
    * through untouched (every in-repo caller is ≤ 1000); a LARGER
    * cohort FAILS FAST here rather than being silently truncated to
    * an arbitrary plan-dependent subset — an evaluation panel that
    * loses queries without an error reports non-reproducible recall.
    * Panels beyond 4096 belong on the indexed paths (IvfIndex /
    * PqVectorIndex), not a nested-loop scan.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     maxQueries: Int = 4096): DataFrame = {
    require(maxQueries >= 1 && maxQueries <= 4096,
      s"maxQueries must be in [1, 4096] (the planLint bounded-cohort waiver): $maxQueries")
    // Truncation guard: limit(maxQueries + 1) bounds the probe to one
    // row past the cap, so the check is O(maxQueries) regardless of
    // cohort size, and CollectLimit short-circuits the scan.
    val nProbe = queries.limit(maxQueries + 1).count()
    require(nProbe <= maxQueries,
      s"query cohort exceeds maxQueries=$maxQueries: bruteForceTopK would " +
        "silently truncate an unordered frame; pre-select a deterministic " +
        "cohort or use an indexed path (IvfIndex/PqVectorIndex)")
    val q = broadcast(queries.limit(maxQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = corpus.crossJoin(q)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      // NaN sorts above every real cosine: a zero/NaN corpus vector
      // would outrank all true neighbors (no-op on valid corpora)
      .where(!isnan(col("cos")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-dup PAIR GENERATION — the vector member of
    * the dedup family (exact / MinHash / SimHash / n-gram /
    * embedding-cosine). Multi-table random-hyperplane LSH: `tables`
    * independent hyperplane sets of `planesPerTable` planes each (few
    * planes per table + several tables = the standard recall knob for
    * moderate-cosine matching: recall = 1-(1-p^b)^L); candidates are
    * vectors sharing a (table, bucket), capped per bucket (skew guard;
    * over-cap buckets emit star pairs to the bucket-min anchor),
    * then verified with the exact fused-codegen cosine. The self-join
    * carries only (table, bucket, vec_id) — never the vectors; no
    * cross join anywhere.
    */
  def cosineNearDupPairs(embs: DataFrame, dim: Int, minCos: Double,
                         tables: Int = 8, planesPerTable: Int = 4,
                         bucketCap: Int = 1000, seed: Long = 42L): DataFrame = {
    val lshs = (0 until tables).map(t =>
      new RandomHyperplaneLsh(dim, planesPerTable, seed = seed + t))
    // all tables' buckets in ONE fused array pass per row (the builtin
    // formulation ran tables×planes interpreted HOF dot products per
    // row — see HyperplaneBuckets; VectorFunctionsSpec pins the two)
    val signs = lshs.map(_.hyperplanes.map(_.toArray).toArray).toArray
    val bucketArr = org.apache.spark.sql.GraftSqlShim.column(HyperplaneBuckets(
      org.apache.spark.sql.GraftSqlShim.expression(col("embedding")), signs))
    // lazily returned plan ⇒ unpersist is the ContextCleaner's job
    val e = embs.persistT
    // Refinement planes for over-cap buckets: a `planesPerTable`-plane
    // bucket is COARSE (2^p buckets), so a big bucket is usually a
    // heterogeneous accident of corpus size, not a near-dup cluster —
    // star pairs to its min-id anchor would be filtered to nothing by
    // the cosine verify (the adversarial sweep measured exactly that: a
    // 10k near-identical cluster produced 0 pairs because every bucket
    // anchor was an unrelated base vector). Instead, over-cap buckets
    // are RE-BUCKETED by 16 extra deterministic hyperplanes; only a
    // genuinely near-identical cluster survives 16 more sign agreements
    // in one sub-bucket, so a sub-bucket still over cap IS homogeneous
    // content and its min-id anchor stands for it (star pairs, O(n)).
    // Under-cap sub-buckets self-join as usual. All still narrow +
    // group-by — never a cross join, never a silent drop.
    val refine = new RandomHyperplaneLsh(dim, 16, seed = seed + 7777)
    val refineBucket = org.apache.spark.sql.GraftSqlShim.column(HyperplaneBuckets(
      org.apache.spark.sql.GraftSqlShim.expression(col("embedding")),
      Array(refine.hyperplanes.map(_.toArray).toArray)))
    val banded = e.select(col("vec_id"),
      element_at(refineBucket, 1).as("sub"),
      posexplode(bucketArr).as(Seq("tbl", "bucket")))
    // Cap gates ride the OVER-cap bucket list — tiny by construction
    // (≤ |banded|/cap buckets), so it broadcasts and the banded frame
    // never takes an extra exchange to be split into safe/hot (the
    // under-cap-list join shuffled every banded row; same rewrite as
    // minhashCandidatePairs' guard).
    val sized = banded.groupBy("tbl", "bucket").agg(count(lit(1)).as("count"))
    val overCap = sized.where(col("count") > bucketCap)
      .select("tbl", "bucket").persistT // two consumers (anti + inner)
    // Guarded hints on both cap gates: broadcast only while the list is
    // actually small; pathological inputs degrade to a shuffle join
    // instead of a failed broadcast (ADVICE r6 #4).
    val overCapB = graft.ops.Hints.guardedBroadcast(overCap)
    val safe = banded.join(overCapB, Seq("tbl", "bucket"), "left_anti")
    val within = safe.select(col("tbl"), col("bucket"), col("vec_id").as("vec_a"))
      .join(safe.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b")), Seq("tbl", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
    val hot = banded.join(overCapB, Seq("tbl", "bucket"))
    val sized2 = hot.groupBy("tbl", "bucket", "sub")
      .agg(count(lit(1)).as("count"), min("vec_id").as("anchor"))
    val overCap2 = sized2.where(col("count") > bucketCap)
      .select("tbl", "bucket", "sub", "anchor").persistT
    val overCap2B = graft.ops.Hints.guardedBroadcast(overCap2)
    val safe2 = hot.join(overCap2B.select("tbl", "bucket", "sub"),
      Seq("tbl", "bucket", "sub"), "left_anti")
    val within2 = safe2.select(col("tbl"), col("bucket"), col("sub"), col("vec_id").as("vec_a"))
      .join(safe2.select(col("tbl"), col("bucket"), col("sub"), col("vec_id").as("vec_b")),
        Seq("tbl", "bucket", "sub"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
    val stars = hot.join(overCap2B, Seq("tbl", "bucket", "sub"))
      .where(col("vec_id") =!= col("anchor"))
      .select(col("anchor").as("vec_a"), col("vec_id").as("vec_b"))
    val pairs = within.unionByName(within2).unionByName(stars).distinct()
    pairs
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      // NaN compares GREATER than any number in Spark, so `>= minCos`
      // alone would PASS a NaN cosine (zero/NaN vector pairs) — the
      // adversarial sweep measured 600 NaN pairs leaking through
      .where(!isnan(col("cos")) && col("cos") >= minCos)
  }
}

/** Random-hyperplane LSH (SimHash for vectors, Charikar STOC'02):
  * `planes` deterministic ±1 hyperplanes; bucket id packs the sign bits
  * of the projections. Vectors in the same bucket are near-duplicate /
  * nearest-neighbor candidates — the scale path that replaces the
  * brute-force cross join: shuffle on bucket id, search within buckets.
  */
class RandomHyperplaneLsh(dim: Int, planes: Int = 16, seed: Long = 42L) extends Serializable {
  require(planes <= 30, "bucket id is packed into an Int")

  /** Deterministic ±1 pattern via a splitmix64-style avalanche of
    * (seed, plane, dim) — no RNG state, reproducible on any cluster. */
  private def sign(p: Int, i: Int): Double = {
    var z = seed + p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  val hyperplanes: Seq[Seq[Double]] =
    (0 until planes).map(p => (0 until dim).map(i => sign(p, i)))

  /** Packed sign-bit bucket id for an embedding column.
    *
    * NULL caveat: `when(dot > 0, ...).otherwise(0)` swallows a null
    * projection, so a NULL embedding lands in bucket 0 — fine for the
    * oracled fixture (no null vectors) but a garbage hot bucket on
    * dirty data. The fused [[HyperplaneBuckets]] expression returns
    * NULL instead (row dropped by the banding posexplode) — prefer it
    * on any corpus that may carry null embeddings (EdgeCasesSpec pins
    * both behaviors). */
  def bucket(v: Column): Column =
    (0 until planes).map { p =>
      when(VectorFunctions.dot(v, typedLit(hyperplanes(p))) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Top-k neighbors of each query, searched only within the query's
    * bucket. Recall < 1 by construction (ANN); bucket count 2^planes
    * bounds the candidate set size.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.withColumn("bucket", bucket(col("embedding")))
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", bucket(col("q_emb"))))
    val scored = c.join(q, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        VectorFunctions.cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Hashing

/** Deterministic sampling for reproducible training-data pipelines.
  *
  * `df.sample()` rides `rand()`, whose draw per row depends on the
  * partitioning and evaluation order — re-running on a different
  * cluster layout samples a DIFFERENT subset, which poisons dataset
  * versioning and makes the sample un-oracle-able. Hash sampling keys
  * the decision on the ROW (md5-60 of its key), so the same row is
  * always in or out: stable under repartitioning, joins, retries, and
  * engine swaps — and exactly reproducible in the DuckDB oracle.
  * Both shapes are narrow (a filter / a per-group top-k); nothing
  * shuffles beyond what the stratified top-k inherently needs.
  */
object Sampling {

  private val HashSpace = (1L << 60).toDouble

  /** Keep rows whose key hash lands in the lowest `fraction` of the
    * 60-bit hash space — an unbiased, partitioning-independent
    * Bernoulli(fraction) sample keyed on `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(Hashing.h60(key.cast("string")) < lit((fraction * HashSpace).toLong))
  }

  /** Dataset-mixture sample: per-stratum Bernoulli fractions in ONE
    * narrow filter — the training-mix step ("keep 80% of lang=en, 30%
    * of lang=de, drop the rest") with the same determinism contract as
    * [[hashSample]]: the decision is a pure function of the row key,
    * so the mix is identical on any partitioning, retry, or engine.
    * Strata absent from `fractions` are dropped. */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
                    fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      s"fractions out of range: $fractions")
    val h = Hashing.h60(key.cast("string"))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (s, f)) =>
      acc || (stratum === lit(s) && h < lit((f * HashSpace).toLong))
    }
    df.where(keep)
  }

  /** Per-stratum keep fractions for a TEMPERATURE-scaled mixture — the
    * standard LLM data-mix knob (weights ∝ countᵅ): α = 1 reproduces
    * the corpus's natural proportions, α = 0 targets a uniform mix
    * across strata, and 0 < α < 1 up-weights small sources the way
    * multilingual/multi-domain training mixes do. Fraction for stratum
    * s with nₛ rows: min(1, target · (nₛᵅ / Σ nᵅ) / nₛ) — the expected
    * kept total is ≈ `targetRows` (less where a stratum saturates
    * at 1).
    *
    * ONE count pass over the data (a map-side-combining groupBy on the
    * low-cardinality stratum column); the resulting map is a handful
    * of doubles on the driver, broadcast into the [[mixtureSample]]
    * filter by its caller — the 100 TB shape is count-pass + narrow
    * filter pass, nothing else.
    *
    * Cross-engine exactness: fractions are computed in a PINNED fold
    * order (strata sorted ascending; Σ is a left fold) from exact
    * int64 counts, and α ∈ {0, 0.5, 1} uses only IEEE-exact kernels
    * (1, sqrt, identity), so a DuckDB oracle reproduces the thresholds
    * bit-for-bit (`list_sum(list(... ORDER BY s))` + the same
    * multiply/divide chain). Other α go through `math.pow` — fine in
    * production, only 1-ulp-portable, so oracle-pinned queries stick
    * to the exact kernels. NULL strata are dropped (same contract as
    * [[mixtureSample]]'s absent strata). */
  def temperatureFractions(df: DataFrame, stratum: Column, alpha: Double,
                           targetRows: Long): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, s"alpha out of [0,1]: $alpha")
    require(targetRows >= 0, s"targetRows negative: $targetRows")
    def powA(n: Double): Double =
      if (alpha == 0.0) 1.0
      else if (alpha == 0.5) math.sqrt(n)
      else if (alpha == 1.0) n
      else math.pow(n, alpha)
    val counts = df.where(stratum.isNotNull)
      .groupBy(stratum.cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty) Map.empty
    else {
      val z = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + powA(n.toDouble) }
      counts.map { case (s, n) =>
        s -> math.min(1.0, targetRows.toDouble * powA(n.toDouble) / z / n.toDouble)
      }.toMap
    }
  }

  /** Per-stratum keep fractions that reshape the corpus to a TARGET
    * distribution by DOWNSAMPLING ONLY — "make the kept set uniform
    * over length bins", "match the reference corpus's language mix".
    * With natural counts nₛ and target shares tₛ (Σtₛ = 1), the
    * largest achievable matched subset keeps fₛ = c·tₛ/nₛ of stratum
    * s, where c = min over strata of nₛ/tₛ — the scarcest stratum
    * relative to its target keeps EVERYTHING (f = 1) and every other
    * stratum is trimmed to proportion. Expected kept total = c rows.
    *
    * One count pass (map-side-combining groupBy on the stratum
    * column); the fraction map is |strata| driver-held doubles, each
    * built from division/min of exact integers — the same
    * bit-portable arithmetic contract as [[temperatureFractions]],
    * so an oracle reproduces the thresholds exactly. Strata absent
    * from `target` are dropped (share 0).
    *
    * Target strata with ZERO rows in the data are dropped from the
    * fraction map and the remaining shares implicitly renormalize —
    * i.e. the kept set matches the target distribution RESTRICTED to
    * reachable strata, not the requested one (the mathematically
    * strict alternatives are c = 0, an empty result, or an error;
    * this op deliberately returns the largest subset matching the
    * reachable restriction instead, ADVICE r7 #3). Callers that need
    * the strict contract should assert
    * `fractions.keySet == target.keySet` on the returned map — a
    * missing key IS the unreachable-stratum signal. */
  def distributionMatchFractions(df: DataFrame, stratum: Column,
                                 target: Map[String, Double]): Map[String, Double] = {
    require(target.values.forall(t => t > 0 && t <= 1),
      s"target shares must be in (0,1]: $target")
    val counts = df.where(stratum.isNotNull)
      .groupBy(stratum.cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toMap
    val present = target.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) Map.empty
    else {
      val c = present.map { case (s, t) => counts(s).toDouble / t }.min
      present.map { case (s, t) =>
        s -> math.min(1.0, c * t / counts(s).toDouble)
      }
    }
  }

  /** [[temperatureFractions]] + [[mixtureSample]] in one call: count
    * pass → fraction map → deterministic hash filter. */
  def temperatureMixtureSample(df: DataFrame, stratum: Column, key: Column,
                               alpha: Double, targetRows: Long): DataFrame =
    mixtureSample(df, stratum, key,
      temperatureFractions(df, stratum, alpha, targetRows))

  /** Stratified deterministic sample: the `k` smallest key hashes per
    * stratum — uniform within each stratum, exactly `min(k, |stratum|)`
    * rows out, same rows on any partitioning. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(Hashing.h60(key.cast("string")), key.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-domain quota cap (crawl curation: "at most `cap` documents per
    * domain/source"), priority = md5-60 of the row key so the kept set
    * is an unbiased deterministic sample of each domain.
    *
    * Same selection semantics as [[stratifiedSample]], different
    * physical shape: the window formulation shuffles EVERY row of every
    * domain before ranking — on a 100 TB crawl where one hot domain
    * carries 10⁹ documents, that is the whole table through one
    * skewed exchange. This rides [[graft.plans.TopKPerKey]] instead: a
    * bounded cap-heap per (domain, input partition) map-side, then ONE
    * shuffle carrying ≤ cap rows per (domain, partition) — the hot
    * domain moves ≤ cap·partitions rows, not 10⁹. Heap memory is
    * O(domains-per-partition × cap): right for the many-rows-per-domain
    * shape a cap exists for (for millions of tiny domains under a huge
    * cap, prefer the window — it spills).
    *
    * Adds a `pri` column (the priority hash) so selection is auditable
    * and the output totally ordered; drop it if not wanted. */
  def domainCap(df: DataFrame, domain: Column, key: Column, cap: Int): DataFrame = {
    val withPri = df.withColumn("__domain", domain)
      .withColumn("pri", Hashing.h60(key.cast("string")))
    graft.plans.TopKPerKey.topK(withPri, Seq("__domain"),
        Seq(col("pri").asc, key.asc), k = cap)
      .drop("__domain")
  }

  /** Weighted deterministic Bernoulli: keep each row with probability
    * min(1, weight / unitWeight) — "sample proportional to length /
    * quality / duplication count", the weighted step training mixes
    * use where [[hashSample]] is the uniform one. Same contract: the
    * decision is a pure function of (key, weight), stable under
    * repartitioning and replayable by the oracle.
    *
    * The comparison stays in INTEGER arithmetic — `hash <
    * min(weight, unitWeight) * (2^60 / unitWeight)` with the scale
    * precomputed as a long — so there is no float rounding to diverge
    * across engines. `weight` must be a non-negative integer column;
    * unitWeight is the weight at which keep-probability saturates
    * (weights at or above it are kept with probability
    * unitWeight·scale / 2^60 — within 2^-50 of certain). The clamp
    * BEFORE the multiply bounds the product by 2^60: without it a
    * weight ≥ ~8·unitWeight overflows the long, silently wrapping
    * negative and DROPPING exactly the heaviest rows. Oracles must
    * mirror the same `least(weight, unitWeight)` clamp. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     unitWeight: Long): DataFrame = {
    require(unitWeight > 0, s"unitWeight must be positive: $unitWeight")
    val scale = (1L << 60) / unitWeight
    val clamped = least(weight.cast("long"), lit(unitWeight))
    df.where(Hashing.h60(key.cast("string")) < clamped * lit(scale))
  }

  /** Deterministic EPOCH SHUFFLE — the global random reorder + shard
    * split every training run performs on its corpus, with the same
    * contract as the samplers above: the permutation is a pure
    * function of (seed, key), so epoch N is byte-identical on any
    * cluster layout, retry, or engine, and epoch N+1 (a new seed) is
    * an independent permutation.
    *
    * Adds `__shuffle_hv` (seeded md5-60 of the key) and `shard`
    * (hv mod nShards). The shuffled order is (hv, key) WITHIN each
    * shard — no global rank, no single-partition window: at any scale
    * the write path is
    * `Sources.writeCorpus(out, partitionCols = Seq("shard"),
    * sortCols = Seq("__shuffle_hv"))` — one hash projection, one
    * partitioned write. Readers stream shards in filename order and
    * get the reproducible shuffled sequence.
    *
    * A NULL key hashes to NULL and lands in a NULL shard — keys must
    * be non-null (they identify the row; dedupe/assign ids first),
    * same contract as the samplers above. */
  def epochShuffle(df: DataFrame, key: Column, seed: Int, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val hv = Hashing.h60Seeded(seed, key.cast("string"))
    df.withColumn("__shuffle_hv", hv)
      .withColumn("shard", pmod(col("__shuffle_hv"), lit(nShards.toLong)))
  }

  /** Leakage-safe train/val/test split: the split decision hashes the
    * GROUP (domain, source document, author…), not the row, so every
    * row of a group lands in the same split — near-duplicates and
    * derived chunks that share a group can never straddle the
    * train/test boundary (the leakage a row-wise split silently
    * allows; group-held-out splitting is standard eval hygiene).
    * Deterministic like every sampler here: pure function of
    * (seed, group), reproducible on any layout, retry, or engine.
    * Weights are fractions of HASH SPACE, so realized sizes converge
    * to them in GROUP count (not row count — a giant group drags its
    * whole mass into one split; that is the point).
    *
    * One narrow projection — no shuffle, no join; groups need no
    * pre-listing. NULL groups get NULL splits (non-null contract as
    * above). */
  def groupSplit(df: DataFrame, group: Column, weights: Seq[(String, Double)],
                 seed: Int = 0): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.map(_._2).sum}")
    val hv = Hashing.h60Seeded(seed, group.cast("string"))
    // cumulative upper bounds in the 2^60 hash space; last bucket
    // closes at exactly 2^60 so rounding can't orphan the top sliver
    val bounds = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * HashSpace).toLong)
    val labeled = bounds.dropRight(1).zip(weights.map(_._1)).foldRight(
      lit(weights.last._1)) { case ((bound, name), rest) =>
      when(hv < lit(bound), lit(name)).otherwise(rest)
    }
    df.withColumn("split", when(group.isNull, lit(null: String)).otherwise(labeled))
  }

  /** Epoch-capped water-filling token-budget allocation — the "how many
    * tokens do I take from each source" step of a training-mix plan.
    * Given per-stratum token counts `(stratumCol, nCol)`, a global
    * budget B and a max-epochs cap (allocation from stratum s may not
    * exceed `maxEpochs · nₛ` — repeating a small source beyond a few
    * epochs hurts more than it helps), the allocation is the unique
    * water level λ with aₛ = min(maxEpochs·nₛ, λ) and Σ aₛ = B: small
    * strata saturate at their cap, everything else gets the SAME token
    * count λ — uniform mixing subject to the epoch constraint.
    *
    * Closed form, no iteration: sort strata by cap ascending; stratum
    * i (1-based, prefixᵢ = Σ_{j≤i} capⱼ) is capped iff
    * `capᵢ·(n−i) ≤ B − prefixᵢ` — giving every later stratum at least
    * capᵢ still fits — and cappedness is monotone in i (capᵢ₊₁ ≥ capᵢ
    * makes the test only harder), so one window pass finds the full
    * capped prefix and λ = (B − paid)/(n − j) in a single division.
    *
    * Determinism/scale: everything up to λ is INTEGER arithmetic on
    * the |strata|-row aggregate (the window is a single partition over
    * that tiny frame — same discipline as every ≤|S|-row analytic in
    * this repo), so the doubles (λ, epochs) are each ONE IEEE division
    * of exact integers: bit-portable across engines. If B ≥ Σ cap every
    * stratum is capped and λ is NULL (the budget is infeasible under
    * the epoch cap; the remainder goes unallocated by design).
    *
    * @param counts one row per stratum: (stratumCol: string, nCol: long)
    * @param budget expression over the 1-row totals frame — columns
    *               `total_n` (Σ nₛ) and `n_strata` are in scope, e.g.
    *               `expr("total_n div 2")`
    * @return stratum, n, cap, capped, alloc (tokens, double), epochs */
  def waterFillAllocation(counts: DataFrame, stratumCol: String, nCol: String,
                          budget: Column, maxEpochs: Long): DataFrame = {
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    // the stratum axis is a bounded registry (sources/domains, not
    // rows); the guard makes that bound STATIC — the closed-form
    // ranked-prefix windows below then run over a provably ≤4096-row
    // frame (planLint's bounded-window proof) — and a registry past
    // the cap fails LOUDLY instead of silently truncating the mix
    val base = RelationalOps.boundedRegistry(
      counts.select(col(stratumCol).as("stratum"),
        col(nCol).cast("long").as("n"),
        (col(nCol).cast("long") * lit(maxEpochs)).as("cap")),
      4096, "waterFillAllocation stratum registry")
    val w = Window.orderBy(col("cap"), col("stratum"))
    val ranked = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prefix", sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = base.agg(sum(col("n")).as("total_n"),
        count(lit(1)).as("n_strata"))
      .select(col("total_n"), col("n_strata"), budget.cast("long").as("b"))
    val flagged = ranked.crossJoin(broadcast(totals))
      .withColumn("capped",
        col("cap") * (col("n_strata") - col("rn")) <= col("b") - col("prefix"))
    val level = flagged.agg(
        coalesce(max(when(col("capped"), col("rn"))), lit(0L)).as("j"),
        coalesce(sum(when(col("capped"), col("cap"))), lit(0L)).as("paid"),
        max(col("b")).as("b2"), max(col("n_strata")).as("ns2"))
      .select(when(col("ns2") > col("j"),
        (col("b2") - col("paid")).cast("double") /
          (col("ns2") - col("j")).cast("double")).as("lambda"))
    flagged.crossJoin(broadcast(level))
      .select(col("stratum"), col("n"), col("cap"), col("capped"),
        when(col("capped"), col("cap").cast("double"))
          .otherwise(col("lambda")).as("alloc"))
      .withColumn("epochs", col("alloc") / col("n").cast("double"))
  }
}

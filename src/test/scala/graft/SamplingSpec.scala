package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic-sampling contracts: the sampled SET is a function of
  * the rows, not the partitioning — the property rand()-based sample()
  * lacks and the one that makes dataset versions reproducible.
  */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("hashSample: partitioning-independent, nested fractions, roughly unbiased") {
    val s20 = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val repart = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    repart shouldBe s20 // same SET whatever the layout
    val s10 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    s10.subsetOf(s20) shouldBe true // nested: smaller fraction ⊂ larger
    val n = docs.count().toDouble
    s20.size.toDouble should (be > 0.1 * n and be < 0.3 * n) // ~20%
  }

  test("stratifiedSample: exactly min(k, |stratum|) per stratum, stable under repartition") {
    val out = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), 5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, sz) => byLang(lang) shouldBe math.min(5L, sz) }
    val again = Sampling.stratifiedSample(docs.repartition(7), col("lang"), col("doc_id"), 5)
    again.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      out.select("doc_id").collect().map(_.getLong(0)).sorted
  }

  test("domainCap: same selection as the window formulation, bounded-heap plan, repartition-stable") {
    val capped = Sampling.domainCap(docs.select(col("doc_id"), col("source")),
      col("source"), col("doc_id"), cap = 7)
    // selection semantics == stratifiedSample (the ranking-window twin):
    // same (hash, key) priority, so the kept SET must agree exactly
    val viaWindow = Sampling.stratifiedSample(
        docs.select(col("doc_id"), col("source")), col("source"), col("doc_id"), 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    capped.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe viaWindow
    // quota respected per domain
    capped.groupBy("source").count().collect()
      .foreach(r => r.getLong(1) should be <= 7L)
    // physical shape: the custom operator, not a ranking window
    val plan = capped.queryExecution.executedPlan.toString
    plan should include("TopKPerKey")
    (plan should not).include("Window")
    // layout-independent selection
    val again = Sampling.domainCap(docs.repartition(9).select(col("doc_id"), col("source")),
      col("source"), col("doc_id"), cap = 7)
    again.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe viaWindow
  }

  test("epochShuffle: shard split + order stable under repartition; new seed = new permutation") {
    def orderOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("shard", "__shuffle_hv", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(t => (t._2, t._3)).map(_._3).toSeq).toMap

    val e1 = orderOf(Sampling.epochShuffle(docs, col("doc_id"), seed = 1, nShards = 4))
    val e1b = orderOf(Sampling.epochShuffle(docs.repartition(9), col("doc_id"), seed = 1, nShards = 4))
    e1 shouldBe e1b // the epoch is a pure function of (seed, key)

    // every doc lands in exactly one shard, shards cover the corpus
    e1.values.map(_.size).sum shouldBe docs.count()
    e1.keySet.foreach(s => s should (be >= 0L and be < 4L))

    // a new seed is a genuinely different permutation (not a rotation)
    val e2 = orderOf(Sampling.epochShuffle(docs, col("doc_id"), seed = 2, nShards = 4))
    e1 should not equal e2
  }

  test("weightedSample: stable under repartition; saturating weights are certain keeps") {
    val w1 = Sampling.weightedSample(docs, col("doc_id"), col("n_chars"), unitWeight = 1000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val w2 = Sampling.weightedSample(docs.repartition(11), col("doc_id"), col("n_chars"), 1000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    w1 shouldBe w2

    // weight >= unitWeight ⇒ probability saturates at 1: every such
    // row must survive
    val heavy = docs.where(col("n_chars") >= 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    heavy.subsetOf(w1.toSet) shouldBe true

    // overflow regression: weight >= ~8*unitWeight used to overflow
    // the long product, wrap negative, and DROP the heaviest rows.
    // The clamp makes extreme weights plain saturated keeps.
    val extreme = Sampling.weightedSample(
      docs.withColumn("w", col("n_chars") * 100000L), col("doc_id"), col("w"), 1000L)
    extreme.count() shouldBe docs.count()

    // heavier docs are kept at a higher rate than light ones
    val lightTotal = docs.where(col("n_chars") < 300).count()
    val lightKept = Sampling.weightedSample(docs.where(col("n_chars") < 300),
      col("doc_id"), col("n_chars"), 1000L).count()
    if (lightTotal > 50) {
      val total = docs.count()
      (lightKept.toDouble / lightTotal) should be < (w1.length.toDouble / total)
    }
  }

  test("temperatureFractions: alpha=1 is the natural mix, alpha=0 uniform, alpha=0.5 between") {
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val target = 200L
    // alpha = 1: weights prop. to counts cancel — ONE fraction for every
    // stratum (the corpus's natural proportions at target/N)
    val f1 = Sampling.temperatureFractions(docs, col("lang"), 1.0, target)
    f1.keySet shouldBe counts.keySet
    f1.values.foreach(_ shouldBe (target.toDouble / total) +- 1e-12)
    // alpha = 0: uniform weights — each stratum targets target/S rows
    val f0 = Sampling.temperatureFractions(docs, col("lang"), 0.0, target)
    f0.foreach { case (s, f) =>
      f shouldBe math.min(1.0, target.toDouble / counts.size / counts(s)) +- 1e-12
    }
    // alpha = 0.5: small strata keep MORE than natural, large ones less
    val f05 = Sampling.temperatureFractions(docs, col("lang"), 0.5, target)
    val smallest = counts.minBy(_._2)._1
    val largest = counts.maxBy(_._2)._1
    f05(smallest) should be > f1(smallest)
    f05(largest) should be < f1(largest)
    // invalid alpha rejected
    an[IllegalArgumentException] should be thrownBy
      Sampling.temperatureFractions(docs, col("lang"), 1.5, target)
  }

  test("temperatureMixtureSample: deterministic under repartition; expected total near target") {
    val kept = Sampling.temperatureMixtureSample(
        docs, col("lang"), col("doc_id"), 0.5, 300L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val repart = Sampling.temperatureMixtureSample(
        docs.repartition(7), col("lang"), col("doc_id"), 0.5, 300L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    repart shouldBe kept
    kept.size.toDouble should (be > 0.6 * 300 and be < 1.4 * 300)
  }

  test("groupSplit: groups never straddle splits; deterministic; sizes near weights") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("domain", col("doc_id") % 97)
    val weights = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val split = Sampling.groupSplit(docs, col("domain"), weights, seed = 3)

    // the leakage guard itself: every domain maps to exactly one split
    split.groupBy("domain").agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") =!= 1).count() shouldBe 0L
    // reruns are identical
    split.select("doc_id", "split").collect().toSet shouldBe
      Sampling.groupSplit(docs, col("domain"), weights, seed = 3)
        .select("doc_id", "split").collect().toSet
    // a different seed reshuffles group assignment
    val other = Sampling.groupSplit(docs, col("domain"), weights, seed = 4)
    other.select("doc_id", "split").collect().toSet should not be
      split.select("doc_id", "split").collect().toSet
    // GROUP-count proportions approach the weights (97 domains, so
    // just sanity bounds; every split must be non-empty)
    val byGroup = split.select("domain", "split").distinct()
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byGroup.keySet shouldBe Set("train", "val", "test")
    byGroup("train").toDouble / 97 should be > 0.6
    // null group -> null split, not an arbitrary bucket
    val withNull = Sampling.groupSplit(
      docs.withColumn("domain", when(col("doc_id") === 0, lit(null)).otherwise(col("domain"))),
      col("domain"), weights, seed = 3)
    withNull.where(col("doc_id") === 0).select("split").head().isNullAt(0) shouldBe true
    // invalid weights rejected
    an[IllegalArgumentException] should be thrownBy
      Sampling.groupSplit(docs, col("domain"), Seq(("a", 0.5), ("b", 0.2)))
  }

  test("distributionMatchFractions: scarcest stratum keeps all; kept mix matches target shape") {
    import spark.implicits._
    // natural mix 100/400/500; uniform target → c = 300, f = (1, .25, .2)
    val df = (0 until 1000).map { i =>
      (i.toLong, if (i < 100) "a" else if (i < 500) "b" else "c")
    }.toDF("id", "s")
    val fr = Sampling.distributionMatchFractions(df, col("s"),
      Map("a" -> (1.0 / 3), "b" -> (1.0 / 3), "c" -> (1.0 / 3)))
    fr("a") shouldBe 1.0
    fr("b") shouldBe 0.25 +- 1e-12
    fr("c") shouldBe 0.2 +- 1e-12
    // expected kept per stratum identical (100 each): f·n equal across strata
    fr("a") * 100 shouldBe fr("b") * 400 +- 1e-9
    fr("b") * 400 shouldBe fr("c") * 500 +- 1e-9
    // strata missing from target are dropped from the fraction map
    Sampling.distributionMatchFractions(df, col("s"),
      Map("a" -> 0.5, "b" -> 0.5)).keySet shouldBe Set("a", "b")
    // invalid target rejected
    an[IllegalArgumentException] should be thrownBy
      Sampling.distributionMatchFractions(df, col("s"), Map("a" -> 0.0))
  }

  test("waterFillAllocation: budget exhausted, caps respected, uniform water level") {
    import spark.implicits._
    val counts = Seq(("a", 100L), ("b", 1000L), ("c", 1000L), ("d", 5000L))
      .toDF("source", "n")
    // B = 3000, maxEpochs 2: cap(a)=200 saturates (200·3 ≤ 3000−200),
    // the rest share λ = 2800/3 ≈ 933.3
    val out = Sampling.waterFillAllocation(counts, "source", "n",
        budget = lit(3000L), maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3), r.getDouble(4), r.getDouble(5))).toMap
    out("a")._2 shouldBe true
    out("a")._3 shouldBe 200.0
    out("a")._4 shouldBe 2.0 // at the epoch cap exactly
    Seq("b", "c", "d").foreach { s =>
      out(s)._2 shouldBe false
      out(s)._3 shouldBe (2800.0 / 3) +- 1e-9 // same water level
    }
    // budget exactly exhausted
    out.values.map(_._3).sum shouldBe 3000.0 +- 1e-6
    // no uncapped allocation below any capped cap (water-level property)
    val minUncapped = out.values.collect { case (_, false, a, _) => a }.min
    val maxCapped = out.values.collect { case (c, true, _, _) => c.toDouble }.max
    minUncapped should be >= maxCapped
    // infeasible budget: every stratum capped, λ NULL → alloc = cap
    val all = Sampling.waterFillAllocation(counts, "source", "n",
        budget = lit(1000000L), maxEpochs = 1)
      .collect()
    all.foreach { r => r.getBoolean(3) shouldBe true; r.getDouble(4) shouldBe r.getLong(2).toDouble }
  }

  test("waterFillAllocation edges: zero budget allocates zero; single stratum takes min(budget, cap)") {
    import spark.implicits._
    val counts = Seq(("a", 100L), ("b", 900L)).toDF("source", "n")
    val zero = Sampling.waterFillAllocation(counts, "source", "n",
      budget = lit(0L), maxEpochs = 1).collect()
    zero.foreach { r => r.getBoolean(3) shouldBe false; r.getDouble(4) shouldBe 0.0 }
    val one = Seq(("only", 500L)).toDF("source", "n")
    // budget below the cap: uncapped, water level IS the budget
    val u = Sampling.waterFillAllocation(one, "source", "n",
      budget = lit(300L), maxEpochs = 2).collect()(0)
    u.getBoolean(3) shouldBe false
    u.getDouble(4) shouldBe 300.0
    // budget above the cap: capped at maxEpochs·n
    val c = Sampling.waterFillAllocation(one, "source", "n",
      budget = lit(5000L), maxEpochs = 2).collect()(0)
    c.getBoolean(3) shouldBe true
    c.getDouble(4) shouldBe 1000.0
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.RelationalOps

/** SURVEY §5 property tests over generated data: dedup idempotence,
  * coalesce monotonicity (the invariant the reference eyeballs in its
  * before/after counts), and the leading-zero key fix's injectivity.
  * Raw ScalaCheck (no scalatestplus bridge in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val siretGen: Gen[Option[String]] = Gen.frequency(
    4 -> Gen.listOfN(14, Gen.numChar).map(l => Some(l.mkString)),
    2 -> Gen.choose(0, 13).flatMap(n => Gen.listOfN(n, Gen.numChar).map(l => Some(l.mkString))),
    1 -> Gen.const(None))

  private val rowsGen: Gen[List[(String, Int, Option[String])]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("k1", "k2", "k3")
      ord <- Gen.choose(0, 20)
      s <- siretGen
    } yield (k, ord, s))

  private val pairsGen: Gen[List[(Option[String], Option[String])]] =
    Gen.nonEmptyListOf(for { o <- siretGen; c <- siretGen } yield (o, c))

  test("keepFirst is idempotent and keeps at most one row per key (generated inputs)") {
    check("idempotent", Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "ord", "siret")
      val once = RelationalOps.keepFirst(df, Seq("k"), Seq(col("ord"), col("siret")))
      val twice = RelationalOps.keepFirst(once, Seq("k"), Seq(col("ord"), col("siret")))
      val a = once.orderBy("k", "ord").collect().toSeq
      val b = twice.orderBy("k", "ord").collect().toSeq
      val keys = once.select("k").collect().map(_.getString(0))
      a == b && keys.distinct.length == keys.length
    })
  }

  test("coalesceValid never decreases the number of valid identifiers") {
    check("monotone", Prop.forAll(pairsGen) { rows =>
      val df = rows.toDF("orig", "cand")
      val before = df.where(RelationalOps.isValidId(col("orig"))).count()
      val after = df
        .select(RelationalOps.coalesceValid(col("orig"), col("cand")).as("r"))
        .where(RelationalOps.isValidId(col("r"))).count()
      after >= before
    })
  }

  test("coalesceValid never replaces an already-valid identifier") {
    check("stable-valid", Prop.forAll(pairsGen) { rows =>
      rows.toDF("orig", "cand")
        .withColumn("r", RelationalOps.coalesceValid(col("orig"), col("cand")))
        .where(RelationalOps.isValidId(col("orig")) && col("r") =!= col("orig"))
        .count() == 0
    })
  }

  test("'0'+code key fix is injective over distinct codes") {
    check("injective", Prop.forAll(Gen.nonEmptyListOf(
        Gen.listOfN(6, Gen.numChar).map(_.mkString))) { codes =>
      val distinctCodes = codes.distinct
      val fixed = distinctCodes.toDF("code")
        .select(concat(lit("0"), col("code")).as("f"))
        .collect().map(_.getString(0))
      fixed.distinct.length == distinctCodes.length
    })
  }

  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      6 -> Gen.alphaLowerChar, 1 -> Gen.const(' '), 1 -> Gen.numChar))
      .map(_.mkString.take(24))

  test("similarityJoin is symmetric and bounded: j(a,b) = j(b,a), 0 < j <= 1") {
    check("symmetric", Prop.forAll(Gen.nonEmptyListOf(nameGen).map(_.distinct.take(8))) { names =>
      val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
      val out = RelationalOps.similarityJoin(
          df, "id", "name", df, "id", "name", minJaccard = 0.01, gramCap = 1000)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val byPair = out.map { case (a, b, j) => (a, b) -> j }.toMap
      val symmetric = out.forall { case (a, b, j) =>
        a == b || byPair.get((b, a)).contains(j) }
      val bounded = out.forall { case (_, _, j) => j > 0.0 && j <= 1.0 + 1e-12 }
      val selfIsOne = out.forall { case (a, b, j) => a != b || j == 1.0 }
      symmetric && bounded && selfIsOne
    }, n = 10)
  }

  test("minhash est_jaccard is bounded and identical texts always pair at est 1.0") {
    check("minhash-bounds", Prop.forAll(Gen.nonEmptyListOf(nameGen).map(_.take(5))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t + " shared anchor tokens") }
      val df = docs.toDF("doc_id", "text")
      val pairs = graft.dedup.Dedup.minhashCandidatePairs(
          graft.dedup.Dedup.minhashSignatures(df, k = 16),
          bands = 4, rowsPerBand = 4, minEst = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val bounded = pairs.forall { case (_, _, e) => e >= 0.0 && e <= 1.0 }
      // any two identical texts must be found with est exactly 1.0
      val dupIds = docs.groupBy(_._2).values.filter(_.size > 1)
        .flatMap(g => g.map(_._1).sorted.combinations(2).map(c => (c(0), c(1))))
        .toSet
      val found = pairs.map { case (a, b, _) => (a, b) }.toSet
      val exact = pairs.filter { case (a, b, _) => dupIds.contains((a, b)) }
        .forall(_._3 == 1.0)
      bounded && dupIds.subsetOf(found) && exact
    }, n = 10)
  }

  test("property: mergeUpsert folds incrementally over version-monotone batches") {
    // the scaladoc's streaming-upsert claim: merge(merge(base, c1), c2)
    // == merge(base, c1 ∪ c2) when (key, version) pairs are unique AND
    // batches are version-monotone (c2's versions all exceed c1's) —
    // the property itself surfaced the monotonicity precondition: an
    // unordered split genuinely diverges, because merging resets the
    // snapshot to version 0 and a later-batch OLDER change then wins
    val changesGen: Gen[List[(Long, String, Long, String)]] =
      Gen.listOf(for {
        k <- Gen.choose(1L, 6L)
        v <- Gen.alphaStr.map(_.take(4))
        ver <- Gen.choose(1L, 50L)
        op <- Gen.frequency(3 -> Gen.const("U"), 1 -> Gen.const("D"))
      } yield (k, v, ver, op)).map(_.distinctBy(c => (c._1, c._3))) // unique (key, version)
    // forAllNoShrink: the default shrinker mutates values OUTSIDE the
    // generator's domain (empty ops, version 0)
    check("incremental", Prop.forAllNoShrink(changesGen, Gen.choose(0, 100)) { (changes, splitPct) =>
      val base = Seq((1L, "b1"), (2L, "b2"), (3L, "b3")).toDF("k", "v")
      def df(cs: List[(Long, String, Long, String)]) =
        cs.toDF("k", "v", "ver", "op")
      val ordered = changes.sortBy(_._3) // version-monotone batch split
      val cut = ordered.length * splitPct / 100
      val (c1, c2) = ordered.splitAt(cut)
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val twoStep = RelationalOps.mergeUpsert(
        RelationalOps.mergeUpsert(base, df(c1), "k", "ver", "op"), df(c2), "k", "ver", "op")
      val oneStep = RelationalOps.mergeUpsert(base, df(changes), "k", "ver", "op")
      rows(twoStep) == rows(oneStep)
    }, n = 15)
  }

  test("property: incremental interval merge equals batch sessionization for ANY arrival order") {
    import graft.streaming.EventsStream
    import graft.streaming.EventsStream.{Event, SessionState}
    val gapMs = 30 * 60000L
    val genEvents = for {
      n <- Gen.choose(1, 40)
      ts <- Gen.listOfN(n, Gen.choose(0L, 100L))
    } yield ts.zipWithIndex.map { case (m, i) =>
      Event(i.toLong, new java.sql.Timestamp(m * 3 * 60000L), 1L, "click", 1.0)
    }
    val prop = Prop.forAll(genEvents, Gen.choose(1, 5)) { (events, nBatches) =>
      // batch truth: global sort then gap split
      val batch = EventsStream.sessionizeBatch(
        spark.createDataset(events)(org.apache.spark.sql.Encoders.product[Event]))
        .collect().map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events)).toSet
      // incremental: arbitrary split into micro-batches, merged via the
      // streaming sessionizers' shared interval merge (no watermark cut,
      // so every session is still "open" at the end)
      val shuffled = scala.util.Random.shuffle(events)
      val batches = shuffled.grouped(math.max(1, shuffled.size / nBatches)).toSeq
      val finalState = batches.foldLeft(Seq.empty[SessionState]) { (open, evs) =>
        EventsStream.mergeUnits(open ++ evs.map(EventsStream.asUnit), gapMs)
      }
      val incremental = finalState.map(s => (s.startMs, s.lastMs, s.n)).toSet
      incremental == batch
    }
    check("merge-parity", prop)
  }

  test("property: fused HyperplaneBuckets equals the HOF bucket fold for ANY float vector") {
    // the bit-identity claim (x*1.0 == x, x*-1.0 == -x, same fold
    // order) pinned on arbitrary finite floats — negatives, tiny
    // denormal-ish magnitudes, mixed signs, any dim 1..64
    import graft.sim.RandomHyperplaneLsh
    import org.apache.spark.sql.GraftSqlShim
    val vecGen = for {
      dim <- Gen.choose(1, 64)
      xs <- Gen.listOfN(dim, Gen.chooseNum(-1e6f, 1e6f))
    } yield xs
    val prop = Prop.forAllNoShrink(Gen.nonEmptyListOf(vecGen).map(_.take(8)), Gen.choose(1L, 999L)) {
      (vecs, seed) =>
        val dim = vecs.map(_.size).max
        val padded = vecs.zipWithIndex.map { case (v, i) =>
          (i.toLong, v ++ Seq.fill(dim - v.size)(0f)) }
        val lshs = (0 until 4).map(t => new RandomHyperplaneLsh(dim, 4, seed + t))
        val df = padded.toDF("vec_id", "embedding")
        val hof = df.select(col("vec_id"),
            array(lshs.map(_.bucket(col("embedding"))): _*).as("b"))
          .orderBy("vec_id").collect().map(_.getSeq[Int](1).toSeq)
        val signs = lshs.map(_.hyperplanes.map(_.toArray).toArray).toArray
        val native = df.select(col("vec_id"),
            GraftSqlShim.column(graft.sim.HyperplaneBuckets(
              GraftSqlShim.expression(col("embedding")), signs)).as("b"))
          .orderBy("vec_id").collect().map(_.getSeq[Int](1).toSeq)
        native.sameElements(hof)
    }
    check("hyperplane-parity", prop, n = 15)
  }

  test("property: scd2 intervals chain per key and collapse equals naive fold") {
    val logGen: Gen[List[(Long, Long, Long, String)]] = Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 30L)
      id <- Gen.choose(0L, 1000000L)
      a <- Gen.oneOf("A", "B", "C")
    } yield (k, t, id, a)).map(_.distinctBy(r => (r._1, r._2, r._3)))
    val prop = Prop.forAll(logGen) { rows =>
      val df = rows.toDF("k", "ts", "id", "attr")
      val hist = RelationalOps.scd2(df, Seq("k"), "ts", Seq("attr"), Seq("id"))
        .orderBy("k", "version").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      // reference fold: sort per key, drop consecutive equal attrs
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val collapsed = sorted.foldLeft(List.empty[(Long, String)]) {
          case (acc, (_, t, _, a)) =>
            if (acc.headOption.exists(_._2 == a)) acc else (t, a) :: acc
        }.reverse
        collapsed.zipWithIndex.map { case ((t, a), i) =>
          (k, i + 1, a, t, collapsed.lift(i + 1).map(_._1))
        }
      }.sortBy(r => (r._1, r._2))
      hist.toSeq == expect &&
        // intervals chain: each valid_to equals the next valid_from
        expect.groupBy(_._1).values.forall { h =>
          h.zip(h.tail).forall { case (cur, next) => cur._5.contains(next._4) } &&
            h.last._5.isEmpty
        }
    }
    check("scd2-chain", prop, n = 30)
  }

  test("property: groupSplit never splits a group and covers every row") {
    val rowsGen2: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0L, 40L)
      id <- Gen.choose(0L, 100000L)
    } yield (g, id))
    val weightsGen: Gen[Seq[(String, Double)]] =
      Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, Gen.choose(1, 10)).map { ws =>
        val total = ws.sum.toDouble
        ws.zipWithIndex.map { case (w, i) => (s"s$i", w / total) }
      })
    val prop = Prop.forAll(rowsGen2, weightsGen, Gen.choose(0, 99)) { (rows, weights, seed) =>
      val out = graft.ops.Sampling.groupSplit(
          rows.toDF("g", "id"), col("g"), weights, seed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      out.length == rows.length &&
        out.forall(_._3 != null) &&
        out.groupBy(_._1).values.forall(_.map(_._3).distinct.length == 1) &&
        out.map(_._3).toSet.subsetOf(weights.map(_._1).toSet)
    }
    check("group-split", prop, n = 25)
  }

  test("dupSpans equals a brute-force reference on random tiny corpora") {
    // tiny vocab so cross-doc window collisions are dense; L = 3
    val docGen: Gen[List[String]] = Gen.choose(2, 6).flatMap(nd =>
      Gen.listOfN(nd, Gen.choose(3, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))))
    def brute(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long, Long)] = {
      val grams = docs.flatMap { case (id, text) =>
        val ts = text.split("\\s+")
        (0 to ts.length - L).map(p => (id, p, ts.slice(p, p + L).mkString(" ")))
      }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      docs.flatMap { case (id, text) =>
        val ts = text.split("\\s+")
        val seeds = (0 to ts.length - L)
          .filter(p => dup(ts.slice(p, p + L).mkString(" "))).toList
        // merge consecutive seed positions into maximal islands
        seeds.foldLeft(List.empty[List[Int]]) {
          case (acc @ (h :: rest), p) if h.head == p - 1 => (p :: h) :: rest
          case (acc, p) => List(p) :: acc
        }.map(isl => (id, isl.min.toLong,
          (isl.max - isl.min + L).toLong, isl.size.toLong))
      }.toSet
    }
    val prop = Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.dedup.Dedup.dupSpans(docs.toDF("doc_id", "text"), minLen = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == brute(docs, 3)
    }
    check("dup-spans-brute", prop, n = 15)
  }

  test("spanScrub equals a brute-force reference on random tiny corpora") {
    val docGen: Gen[List[String]] = Gen.choose(2, 6).flatMap(nd =>
      Gen.listOfN(nd, Gen.choose(3, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def brute(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long, Long, String)] = {
      val grams = docs.flatMap { case (id, text) =>
        val ts = text.split("\\s+")
        (0 to ts.length - L).map(p => (id, p, ts.slice(p, p + L).mkString(" ")))
      }
      val owner = grams.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2)
        .map { case (g, occ) => g -> occ.map(_._1).min }
      docs.flatMap { case (id, text) =>
        val ts = text.split("\\s+")
        val removed = (0 to ts.length - L)
          .filter { p =>
            val o = owner.get(ts.slice(p, p + L).mkString(" "))
            o.exists(_ != id)
          }
          .flatMap(p => p until p + L).toSet
        if (removed.isEmpty) None
        else {
          val kept = ts.indices.filterNot(removed).map(ts)
          Some((id, ts.length.toLong, removed.size.toLong,
            (ts.length - removed.size).toLong * 1000000L / ts.length,
            md5hex(kept.mkString(" "))))
        }
      }.toSet
    }
    val prop = Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.dedup.Dedup.spanScrub(docs.toDF("doc_id", "text"), minLen = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getAs[Long]("kept_ppm"), r.getAs[String]("scrubbed_hash"))).toSet
      got == brute(docs, 3)
    }
    check("span-scrub-brute", prop, n = 15)
  }
}

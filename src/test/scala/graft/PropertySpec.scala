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
}

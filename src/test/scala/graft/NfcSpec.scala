package graft

import org.apache.spark.sql.functions._

import graft.text.Nfc

/** Direct-construction pins for the native NFC expression cited by
  * `text/Nfc.scala` (VERDICT r8 item 3): combining-mark composition,
  * the Angstrom-sign singleton, Hangul jamo composition, NFC-invariant
  * compatibility characters, the already-normalized fast path, and the
  * expression surface (codegen + null). All non-ASCII is built from
  * `\u` escapes so no editor/tool normalization can silently rewrite
  * the fixtures (the q188 source-hygiene rule). */
class NfcSpec extends SparkSpec {
  import spark.implicits._

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(Nfc.nfc(col("t"))).as[String].head()

  test("decomposed e + U+0301 composes to U+00E9") {
    nfcOf("Café") shouldBe "Café"
  }

  test("precomposed U+00E9 is already NFC - unchanged") {
    nfcOf("Café") shouldBe "Café"
  }

  test("Angstrom SIGN U+212B is an NFC singleton -> U+00C5") {
    nfcOf("10 Å") shouldBe "10 Å"
  }

  test("precomposed U+00C5 stays U+00C5 (the q188 %4==1 distinction)") {
    nfcOf("Å") shouldBe "Å"
  }

  test("Hangul jamo L+V+T compose to one syllable") {
    // CHOSEONG HIEUH + JUNGSEONG A + JONGSEONG NIEUN -> U+D55C
    nfcOf("한") shouldBe "한"
  }

  test("compatibility ligature U+FB01 is NFC-invariant (no NFKC folding)") {
    nfcOf("ﬁle") shouldBe "ﬁle"
  }

  test("ASCII fast path returns input unchanged") {
    nfcOf("plain ascii text, no marks") shouldBe "plain ascii text, no marks"
  }

  test("null propagates, non-string input is a type error") {
    Seq[String](null).toDF("t").select(Nfc.nfc(col("t")))
      .collect().head.isNullAt(0) shouldBe true
    an[Exception] should be thrownBy
      Seq(1).toDF("t").select(Nfc.nfc(col("t"))).collect()
  }

  test("kernel matches JDK Normalizer over mixed corpus (codegen parity)") {
    val inputs = Seq("Café du Å", "한",
      "ascii", "é́") // last: composed + extra mark -> recompose
    val viaDf = inputs.toDF("t").select(Nfc.nfc(col("t"))).as[String].collect()
    val viaJdk = inputs.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    viaDf.toSeq shouldBe viaJdk
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** All non-ASCII is written as \ u escapes: composed vs combining forms
  * are the POINT here, and source-encoding round-trips must not be able
  * to silently re-normalize the fixtures.
  */
class UnicodeNormSpec extends graft.SparkSpec {
  import UnicodeNorm._
  import spark.implicits._

  private val aAcute = "á"          // á precomposed
  private val aCombining = "á"     // a + combining acute
  private val fiLig = "ﬁ"           // ﬁ ligature

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(c.as("r")).as[String].head()

  test("NFC composes combining sequences; NFD splits precomposed") {
    assert(one(unicode_normalize($"s", "NFC"), aCombining) == aAcute)
    assert(one(unicode_normalize($"s", "NFD"), aAcute) == aCombining)
    assert(one(unicode_normalize($"s", "NFKC"), fiLig) == "fi")
    assert(one(unicode_normalize($"s", "NFC"), aAcute) == aAcute)
  }

  test("strip_accents: precomposed, combining, and multi-mark") {
    assert(one(strip_accents($"s"), s"café") == "cafe")
    assert(one(strip_accents($"s"), s"café") == "cafe")
    assert(one(strip_accents($"s"),
      "àèìòù ñ ç") == "aeiou n c")
    // ề = e + circumflex + grave (two marks on one base)
    assert(one(strip_accents($"s"), "ề") == "e")
  }

  test("stroked letters carry no combining mark and survive") {
    assert(one(strip_accents($"s"), "Đø") == "Đø")
  }

  test("pure ASCII is the identity — fast path returns the input object") {
    val s = UTF8String.fromString("plain ascii text 123")
    assert(UnicodeNormUtil.normalize(s, UnicodeNormUtil.formIndex("NFC")) eq s)
    assert(UnicodeNormUtil.stripAccents(s) eq s)
  }

  test("null propagates; empty passes through") {
    val df = Seq(Option(aAcute), None, Option("")).toDF("s")
    val out = df.select(unicode_normalize($"s", "NFC").as("r"))
      .as[Option[String]].collect()
    assert(out.toSeq == Seq(Option(aAcute), None, Option("")))
  }

  test("unknown form is rejected") {
    intercept[IllegalArgumentException] {
      one(unicode_normalize($"s", "NFX"), "x")
    }
  }

  test("results agree between plan-level (codegen) and direct eval") {
    val inputs = Seq(s"${aAcute}bc", s"café Über", "no accents",
      s"${fiLig}ñ", "")
    val df = inputs.toDF("s")
    val viaPlan = df
      .select(unicode_normalize($"s", "NFKC").as("n"), strip_accents($"s").as("a"))
      .as[(String, String)].collect().toSeq
    val direct = inputs.map { s =>
      val u = UTF8String.fromString(s)
      (UnicodeNormUtil.normalize(u, UnicodeNormUtil.formIndex("NFKC")).toString,
        UnicodeNormUtil.stripAccents(u).toString)
    }
    assert(viaPlan == direct)
  }
}

package graft.quality

import graft.SparkSpec
import graft.transform.Cleansers
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties from SURVEY.md §5: reconciliation,
  * dedup idempotence, and Python-semantics models for the native
  * cleansers. Plain Gen + fixed seeds (no scalatestplus bridge in the
  * offline cache): each property is evaluated over several seeded
  * samples.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: occurrence histogram reconciles to input count; dedup is idempotent") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(1, 5), Gen.choose(1, 3)))
    samples(gen, 5).foreach { rows =>
      val df = rows.toDF("k", "v")
      val numbered = Dedup.withOccurrenceId(df, Seq("k", "v"), Seq($"k"))
      val profile = Dedup.occurrenceProfile(numbered)
      assert(Dedup.reconcile(profile).as[Long].head() == rows.length.toLong)
      val deduped = Dedup.dedupByOccurrence(numbered).drop("occur_id")
      assert(deduped.count() == rows.toSet.size.toLong)
      assert(deduped.distinct().count() == deduped.count()) // idempotent
    }
  }

  test("property: stripPercent matches Python rstrip('%') semantics") {
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.alphaNumStr.map(_.take(8)), Gen.choose(0, 3))
        .map { case (s, n) => s + "%" * n })
    samples(gen, 3).foreach { ss =>
      val got = ss.toDF("s").select(Cleansers.stripPercent($"s")).as[String].collect()
      val model = ss.map(_.reverse.dropWhile(_ == '%').reverse) // Python rstrip('%')
      assert(got.toSeq == model)
    }
  }

  test("property: monthToken matches Python split('-')[0] semantics") {
    val gen = Gen.listOfN(40,
      Gen.listOfN(3, Gen.alphaStr.map(_.take(4))).map(_.mkString("-"))
        .flatMap(s => Gen.oneOf(s, s.replace("-", ""))))
    samples(gen, 3).foreach { ss =>
      val got = ss.toDF("s").select(Cleansers.monthToken($"s")).as[String].collect()
      val model = ss.map(_.split("-", -1).head) // Python split('-')[0]
      assert(got.toSeq == model)
    }
  }

  test("property: null-repair fill leaves no nulls and preserves row count") {
    val gen = Gen.listOfN(40, Gen.option(Gen.choose(-100.0, 100.0)))
    samples(gen, 5).foreach { vals =>
      val df = vals.map(v => Tuple1(v.map(Double.box).orNull))
        .toDF("x").select($"x".cast("double").as("x"))
      val filled = NullRepair.fill(df, Map("x" -> 0.0))
      assert(filled.count() == vals.length.toLong)
      assert(NullRepair.rowsWithAnyNull(filled).count() == 0)
    }
  }
}

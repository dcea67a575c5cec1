package graft.operators

import graft.SparkSpec
import graft.quality.Boilerplate
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the curation operators (same plain
  * Gen + fixed-seed idiom as PropertiesSpec — no scalatestplus bridge
  * in the offline cache).
  */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(977L + i)))

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    docs <- Gen.listOfN(n,
      Gen.choose(1, 23).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "tok")).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: packing conserves every token exactly once, packs fill to seqLen") {
    for (docs <- samples(docsGen, 4); seqLen <- Seq(5, 16)) {
      val df = docs.toDF("doc_id", "text")
      val spans = Packing.packSpans(df, "doc_id", "text", seqLen, buckets = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val tokCount = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
      // conservation: per-doc span lengths sum to the token count,
      // spans are contiguous from offset 0
      spans.groupBy(_._2).foreach { case (id, ss) =>
        assert(ss.map(_._5).sum == tokCount(id))
        val sorted = ss.sortBy(_._3)
        assert(sorted.head._3 == 0L)
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a._3 + a._5 == b._3); case _ => ()
        }
      }
      // fill: every pack but the last is exactly seqLen
      val fills = spans.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
      val last = fills.keys.max
      fills.foreach { case (p, f) =>
        assert(if (p == last) f <= seqLen else f == seqLen.toLong, s"pack $p fill $f")
      }
      // pack offsets stay inside [0, seqLen)
      assert(spans.forall(s => s._4 >= 0 && s._4 < seqLen))
    }
  }

  test("property: boilerplate strip = per-doc filter against the census (order kept)") {
    val linesGen = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, Gen.choose(1, 6).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf("menu", "footer", "x y", "p q r", "unique"))))
    } yield docs.zipWithIndex.flatMap { case (ls, d) =>
      ls.zipWithIndex.map { case (l, i) => (d.toLong, i.toLong, l) }
    }
    for (rows <- samples(linesGen, 5); thr <- Seq(2L, 3L)) {
      val df = rows.toDF("doc_id", "line_no", "line")
      val freq = rows.groupBy(_._3).view
        .mapValues(_.map(_._1).distinct.size.toLong).toMap
      val expect = rows.filter(r => freq(r._3) < thr)
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).mkString("\n")).toMap
      val got = Boilerplate
        .stripFrequentLines(df, "doc_id", "line_no", "line", thr)
        .as[(Long, String)].collect().toMap
      assert(got == expect)
    }
  }

  test("property: bucketed range join equals the brute-force non-equi join") {
    val ptsGen = Gen.listOfN(25, Gen.choose(-50.0, 50.0))
    val ivGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(-60.0, 60.0), Gen.choose(-10.0, 25.0)))
    for (i <- 1 to 4) {
      val pts = samples(ptsGen, 1).head.zipWithIndex
        .map { case (v, j) => (j.toLong, v) }.toDF("pid", "p")
      // spans include negative lengths (degenerate) and zero-width
      val iv = samples(ivGen, 1).head.zipWithIndex
        .map { case ((lo, len), j) => (j.toLong, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      for (w <- Seq(0.7, 5.0, 120.0)) {
        val brute = pts.crossJoin(iv)
          .filter($"p" >= $"lo" && $"p" < $"hi")
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val bucketed = RangeJoin
          .pointInInterval(pts, "p", iv, "lo", "hi", w)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        assert(bucketed == brute, s"round $i width $w")
      }
    }
  }
}

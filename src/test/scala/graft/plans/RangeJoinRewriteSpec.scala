package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The rewrite runs in the session only when the width conf is set —
  * each test sets/unsets it around the action. The shared test session
  * already carries GraftExtensions.
  */
class RangeJoinRewriteSpec extends graft.SparkSpec {
  import spark.implicits._

  private def withWidth[T](w: String)(f: => T): T = {
    spark.conf.set(RangeJoinToBucketJoin.WidthConf, w)
    try f finally spark.conf.unset(RangeJoinToBucketJoin.WidthConf)
  }

  private def points = Seq(
    (1L, 0.0), (2L, 5.0), (3L, 9.99), (4L, 10.0), (5L, 15.0),
    (6L, 100.0), (7L, -3.5), (8L, 250.0)
  ).toDF("pid", "p")

  private def intervals = Seq(
    (10L, 0.0, 10.0), (11L, 10.0, 10.0), (12L, 20.0, 5.0),
    (13L, -5.0, 0.0), (14L, 9.0, 16.0), (15L, 240.0, 260.0)
  ).toDF("iid", "lo", "hi")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("band join rewrites away the nested loop and matches the naive result") {
    val q = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
    val naive = pairs(q)
    withWidth("4.0") {
      val q2 = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      assert(pairs(q2) == naive)
      val p = plan(q2)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("Generate explode"), p)
    }
  }

  test("open/closed bound variants keep their exact edge semantics") {
    val variants: Seq[(DataFrame, DataFrame) => org.apache.spark.sql.Column] = Seq(
      (a, b) => a("p") >= b("lo") && a("p") < b("hi"),
      (a, b) => a("p") > b("lo") && a("p") <= b("hi"),
      (a, b) => a("p") >= b("lo") && a("p") <= b("hi"),
      (a, b) => b("lo") <= a("p") && b("hi") > a("p"))
    for ((mk, i) <- variants.zipWithIndex) {
      val (p1, i1) = (points, intervals)
      val naive = pairs(p1.join(i1, mk(p1, i1)))
      withWidth("7.0") {
        val (p2, i2) = (points, intervals)
        val got = pairs(p2.join(i2, mk(p2, i2)))
        assert(got == naive, s"variant $i")
      }
    }
  }

  test("interval side may be the left input (orientation B)") {
    val naive = pairs(intervals.join(points, $"p" >= $"lo" && $"p" < $"hi"))
    withWidth("4.0") {
      val q = intervals.join(points, $"p" >= $"lo" && $"p" < $"hi")
      assert(pairs(q) == naive)
      assert(!plan(q).contains("BroadcastNestedLoopJoin"))
    }
  }

  test("null points and bounds drop on both paths alike") {
    val p2 = Seq((1L, Some(5.0)), (2L, Option.empty[Double])).toDF("pid", "p")
    val i2 = Seq((10L, Some(0.0), Some(10.0)), (11L, Option.empty[Double], Some(10.0)))
      .toDF("iid", "lo", "hi")
    val naive = pairs(p2.join(i2, $"p" >= $"lo" && $"p" < $"hi"))
    withWidth("4.0") {
      assert(pairs(p2.join(i2, $"p" >= $"lo" && $"p" < $"hi")) == naive)
    }
    assert(naive == Set((1L, 10L)))
  }

  test("joins with a cross-side equality are left alone") {
    val p2 = points.withColumn("k", $"pid" % 2)
    val i2 = intervals.withColumn("k", $"iid" % 2)
    withWidth("4.0") {
      val q = p2.join(i2, p2("k") === i2("k") && $"p" >= $"lo" && $"p" < $"hi")
      q.collect()
      val s = q.queryExecution.executedPlan.toString
      assert(!s.contains("Generate explode"), s)
    }
  }

  test("rule is inert without the conf") {
    val q = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
    val s = plan(q)
    assert(s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("same-side extra predicates ride along") {
    val naive = pairs(points.join(intervals,
      $"p" >= $"lo" && $"p" < $"hi" && $"pid" > 1 && $"iid" < 15))
    withWidth("4.0") {
      val got = pairs(points.join(intervals,
        $"p" >= $"lo" && $"p" < $"hi" && $"pid" > 1 && $"iid" < 15))
      assert(got == naive)
    }
  }

  test("fixture parity: lineitem prices in order price bands") {
    val pts = graft.core.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey".as("pid"), $"l_extendedprice".as("p"))
    val iv = graft.core.Tables.orders(spark, sf0001)
      .select($"o_orderkey".as("iid"), $"o_totalprice".as("lo"),
        ($"o_totalprice" + 500.0).as("hi"))
    val naive = pairs(pts.join(iv, $"p" >= $"lo" && $"p" < $"hi"))
    withWidth("500.0") {
      val q = pts.join(iv, $"p" >= $"lo" && $"p" < $"hi")
      assert(pairs(q) == naive)
      assert(!plan(q).contains("BroadcastNestedLoopJoin"))
    }
    assert(naive.nonEmpty)
  }

  test("an interval wider than maxSpan buckets fails fast with remediation") {
    // the 20-unit interval at width 1e-4 = 200k buckets > default 65536:
    // without the guard this materializes the fan-out (or dies inside
    // Sequence); with it, a clear error names the confs to turn
    withWidth("0.0001") {
      val q = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      val e = intercept[Exception](q.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      val all = msgs(e).mkString("\n")
      assert(all.contains("graft range-join rewrite"), all)
      assert(all.contains(RangeJoinToBucketJoin.MaxSpanConf), all)
    }
    // raising the cap un-blocks the same query, results intact
    val naive = pairs(points.join(intervals, $"p" >= $"lo" && $"p" < $"hi"))
    withWidth("0.0001") {
      spark.conf.set(RangeJoinToBucketJoin.MaxSpanConf, "400000")
      try {
        val q = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
        assert(pairs(q) == naive)
      } finally spark.conf.unset(RangeJoinToBucketJoin.MaxSpanConf)
    }
  }

  test("malformed width conf disables the rule instead of failing queries") {
    for (bad <- Seq("not-a-number", "-5", "0")) {
      withWidth(bad) {
        val q = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
        assert(q.count() == 8L)   // plans and runs fine, naive path
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends graft.SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0), (2L, 5.0), (3L, 9.99), (4L, 10.0), (5L, 15.0),
    (6L, 100.0), (7L, -3.5), (8L, 250.0)
  ).toDF("pid", "p")

  private def intervals = Seq(
    (10L, 0.0, 10.0),    // catches 0.0, 5.0, 9.99 — NOT 10.0 (half-open)
    (11L, 10.0, 10.0),   // empty (end == start)
    (12L, 20.0, 5.0),    // degenerate (end < start) — must not throw
    (13L, -5.0, 0.0),    // negative span catches -3.5, not 0.0
    (14L, 9.0, 16.0),    // overlaps 10: catches 9.99, 10.0, 15.0
    (15L, 240.0, 260.0)  // far bucket
  ).toDF("iid", "lo", "hi")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (1L, 10L), (2L, 10L), (3L, 10L),
    (7L, 13L),
    (3L, 14L), (4L, 14L), (5L, 14L),
    (8L, 15L))

  test("golden half-open matches, degenerate intervals match nothing") {
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 4.0)
    assert(pairs(got) == expected)
  }

  test("bucket width does not change the result") {
    for (w <- Seq(0.5, 1.0, 7.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
      assert(pairs(got) == expected, s"width $w")
    }
  }

  test("fan-out guard: an over-wide interval fails fast with the remediation") {
    // interval 15 spans 20 buckets at width 1.0 — a maxSpan of 4 must
    // trip with the clear message, not silently explode or hit
    // Sequence's opaque max-array-length error; compliant maxSpan
    // passes untouched. Same contract on both direct APIs.
    def msgOf(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && (c.getMessage == null ||
        !c.getMessage.contains("spans more than"))) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    val e1 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        1.0, maxSpan = 4L).count()
    }
    assert(msgOf(e1).contains("spans more than 4 buckets"), msgOf(e1))
    assert(msgOf(e1).contains("widen bucketWidth"), msgOf(e1))
    val e2 = intercept[Exception] {
      RangeJoin.intervalOverlap(intervals, "lo", "hi",
        intervals.toDF("iid2", "lo2", "hi2"), "lo2", "hi2",
        1.0, maxSpan = 4L).count()
    }
    assert(msgOf(e2).contains("spans more than 4 buckets"), msgOf(e2))
    // generous cap: identical results to the unguarded default
    assert(pairs(RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", 1.0, maxSpan = 64L)) == expected)
    // a null-bounded interval row DROPS silently (pre-guard behavior),
    // never trips the span error — Catalyst may merge the guard with
    // the start<end filter, and And still evaluates the guard on NULL
    val withNull = intervals.unionByName(
      Seq((99L, Option.empty[Double], Option(5.0)),
        (98L, Option(1.0), Option.empty[Double]))
        .toDF("iid", "lo", "hi"))
    assert(pairs(RangeJoin.pointInInterval(points, "p", withNull,
      "lo", "hi", 1.0, maxSpan = 64L)) == expected)
  }

  test("parity with the brute-force non-equi join on fixture data") {
    val pts = graft.core.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey".as("pid"), $"l_extendedprice".as("p"))
    val iv = graft.core.Tables.orders(spark, sf0001)
      .select($"o_orderkey".as("iid"), $"o_totalprice".as("lo"),
        ($"o_totalprice" + 500.0).as("hi"))
    val brute = pts.crossJoin(iv).filter($"p" >= $"lo" && $"p" < $"hi")
    val bucketed = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi", 500.0)
    assert(pairs(bucketed) == pairs(brute))
    assert(bucketed.count() > 0, "parity test must exercise real matches")
  }

  test("a pre-existing __bucket column on either side survives intact") {
    val pts = points.withColumn("__bucket", lit("user-data-p"))
    val ivs = intervals.withColumn("__bucket", lit("user-data-i"))
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 4.0)
    assert(pairs(got) == expected)
    // both sides' user columns are in the output, values untouched
    // (positional access: the duplicate name is ambiguous by-name)
    val idxs = got.columns.zipWithIndex.filter(_._1 == "__bucket").map(_._2)
    assert(idxs.length == 2,
      s"expected both user __bucket columns, got: ${got.columns.mkString(",")}")
    val row = got.collect().head
    assert(idxs.map(row.getString).toSet == Set("user-data-p", "user-data-i"))
  }

  test("interval overlap: brute parity, exact multiplicity, width-invariant") {
    val a = Seq((1L, 0.0, 10.0), (2L, 5.0, 6.0), (3L, 20.0, 25.0),
      (4L, 9.0, 9.0), (5L, -8.0, -2.0)).toDF("aid", "alo", "ahi")
    val b = Seq((10L, 9.0, 21.0), (11L, 5.5, 5.6), (12L, 30.0, 31.0),
      (13L, -3.0, 1.0), (14L, 24.0, 40.0)).toDF("bid", "blo", "bhi")
    val brute = a.crossJoin(b)
      .filter($"alo" < $"bhi" && $"blo" < $"ahi")
      .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    for (w <- Seq(0.5, 3.0, 7.0, 100.0)) {
      val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == brute, s"width $w")  // sorted SEQ equality: no dup rows
    }
    assert(brute.nonEmpty)
  }

  test("interval overlap fixture parity with the brute non-equi join") {
    val a = graft.core.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice".as("alo"),
        ($"o_totalprice" + 500.0).as("ahi"))
    val b = graft.core.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice".as("blo"), ($"l_extendedprice" + 300.0).as("bhi"))
    val brute = a.crossJoin(b).filter($"alo" < $"bhi" && $"blo" < $"ahi")
      .select($"o_orderkey", $"l_orderkey", $"l_linenumber")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 400.0)
      .select($"o_orderkey", $"l_orderkey", $"l_linenumber")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("integer-cents exact sum is bit-identical to the decimal route " +
    "(the r17 range_join bench optimization)") {
    // the bench's rangeJoinAgg replaced Exact.dsum (per-pair BigDecimal
    // cast + non-compact decimal agg buffer) with an exact int64 cents
    // sum; this arm holds the two spellings to bit equality over the
    // real fixture prices at every aggregation group
    val joined = RangeJoin.pointInInterval(
      graft.core.Tables.lineitem(spark, sf0001)
        .select($"l_orderkey", $"l_extendedprice",
          floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("cents")),
      "l_extendedprice",
      graft.core.Tables.orders(spark, sf0001)
        .select($"o_orderkey", $"o_totalprice".as("lo"),
          ($"o_totalprice" + 200.0).as("hi")),
      "lo", "hi", 200.0)
    val both = joined.groupBy($"o_orderkey")
      .agg(Exact.dsum($"l_extendedprice").as("dec_sum"),
        (sum($"cents").cast("double") / 100.0).as("cents_sum"))
      .select($"dec_sum", $"cents_sum").as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (d, c) =>
      assert(java.lang.Double.doubleToRawLongBits(d) ==
        java.lang.Double.doubleToRawLongBits(c), s"$d != $c")
    }
  }

  test("plans as an equi join, not a nested-loop/cartesian") {
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 4.0)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}

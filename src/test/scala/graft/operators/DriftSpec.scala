package graft.operators

import org.apache.spark.sql.functions._

class DriftSpec extends graft.SparkSpec {
  import spark.implicits._

  private def snap(vals: Seq[Double]) = vals.toDF("v")

  test("identical snapshots measure exactly zero drift") {
    val s = snap((1 to 100).map(_.toDouble))
    val psi = Drift.psi(s, s, "v", 10).as[Double].collect().head
    assert(psi == 0.0)
  }

  test("a planted location shift trips the 0.25 'shifted' threshold") {
    val base = snap((1 to 100).map(_.toDouble))
    val cur = snap((1 to 100).map(_ + 60.0))
    val psi = Drift.psi(base, cur, "v", 10).as[Double].collect().head
    assert(psi > 0.25, s"psi = $psi")
  }

  test("profile covers every bucket; empty buckets carry finite smoothed terms") {
    val base = snap((1 to 100).map(_.toDouble))
    val cur = snap(Seq(1.0, 2.0, 3.0)) // everything in bucket 0
    val prof = Drift.psiProfile(base, cur, "v", 10)
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(prof.map(_._1).toSeq == (0L until 10L))
    assert(prof.map(_._2).sum == 100L)
    assert(prof.map(_._3).sum == 3L)
    assert(prof.forall(r => !r._6.isNaN && !r._6.isInfinite))
  }

  test("nulls are excluded; constant baseline collapses to one bucket without dividing by zero") {
    val base = Seq[java.lang.Double](5.0, 5.0, null).toDF("v")
    val cur = Seq[java.lang.Double](5.0, null).toDF("v")
    val prof = Drift.psiProfile(base, cur, "v", 10)
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(prof.map(_._2).sum == 2L && prof.map(_._3).sum == 1L)
    assert(prof.head._2 == 2L, "hi==lo routes everything to bucket 0")
    assert(prof.forall(r => !r._6.isNaN && !r._6.isInfinite))
  }

  test("plan shape: partial aggs + broadcasts, no window, no sort-merge join") {
    val o = graft.core.Tables.orders(spark, sf001)
    val plan = Drift.psiProfile(
      o.filter(year($"o_orderdate") <= 1994),
      o.filter(year($"o_orderdate") >= 1995),
      "o_totalprice", 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("partial_count"), "bucket counts must map-side combine")
  }

  test("KS statistic: identical samples 0, disjoint samples 1, shift golden") {
    import org.apache.spark.sql.functions.col
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val same = DriftKs.ksStatistic(a, a, "v").collect().head
    assert(same.getAs[Double]("ks_d") == 0.0)
    val b = Seq(10.0, 11.0, 12.0, 13.0).toDF("v")
    val disjoint = DriftKs.ksStatistic(a, b, "v").collect().head
    assert(disjoint.getAs[Double]("ks_d") == 1.0)
    // base {1,2,3,4} vs cur {3,4,5,6}: D = max at v=2 -> |2/4 - 0/4| = 0.5
    val c = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val shift = DriftKs.ksStatistic(a, c, "v").collect().head
    assert(shift.getAs[Double]("ks_d") == 0.5)
    assert(shift.getAs[Long]("max_num") == 8L)
  }
}

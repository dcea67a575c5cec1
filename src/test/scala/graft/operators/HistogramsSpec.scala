package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogramsSpec extends SparkSpec {

  test("approx equi-depth: buckets cover everything, depths near-equal, ranges ordered") {
    val orders = graft.core.Tables.orders(spark, sf001)
    val total = orders.count()
    val out = Histograms.equiDepthApprox(orders, "o_totalprice", 10)
      .collect()
    assert(out.map(_.getLong(1)).sum == total, "every row must land in a bucket")
    // sketch-grade depth balance: each bucket within 25% of ideal
    val ideal = total / 10.0
    out.foreach { r =>
      assert(math.abs(r.getLong(1) - ideal) / ideal < 0.25,
        s"bucket ${r.getInt(0)} depth ${r.getLong(1)} vs ideal $ideal")
    }
    // bucket value ranges are ordered and non-overlapping
    val sorted = out.sortBy(_.getInt(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2),
        s"bucket ranges overlap: ${a.getDouble(3)} > ${b.getDouble(2)}")
      case _ =>
    }
  }

  test("NULL values are excluded: bucket counts sum to the non-null count, bucket 1 not inflated") {
    import spark.implicits._
    // without the isNotNull filter, `col >= cut` evaluates null for null
    // rows, every when-branch misses, and all 60 nulls land in bucket 1
    val vals: Seq[java.lang.Double] =
      (1 to 100).map(i => java.lang.Double.valueOf(i.toDouble)) ++
        Seq.fill(60)(null.asInstanceOf[java.lang.Double])
    val df = vals.toDF("v")
    val out = Histograms.equiDepthApprox(df, "v", 4).collect()
    assert(out.map(_.getLong(1)).sum == 100L,
      "bucket counts must sum to the NON-NULL count (nulls excluded)")
    val b1 = out.find(_.getInt(0) == 1).get.getLong(1)
    assert(b1 <= 35L, s"bucket 1 inflated by nulls: depth $b1, ideal 25")
  }

  test("no global sort or window in the plan — bucket id is a literal when-chain") {
    val orders = graft.core.Tables.orders(spark, sf001)
    val plan = Histograms.equiDepthApprox(orders, "o_totalprice", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no ntile/global window allowed:\n$plan")
    assert(!plan.contains("Join"), s"cutpoints are literals, not a join:\n$plan")
    assert(plan.contains("CASE WHEN"), s"expected unrolled literal cutpoints:\n$plan")
  }
}

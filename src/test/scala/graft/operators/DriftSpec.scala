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

  test("psiStream's literal-baseline plan equals batch psi bit-for-bit") {
    // psiStream's agg runs fine on a batch frame — that isolates the
    // arithmetic parity claim (plan-literal q/bounds + one-row
    // conditional counts + left-fold) from streaming delivery
    val base = snap((1 to 100).map(_.toDouble))
    val cur = snap((1 to 100).map(v => v + (v % 7).toDouble))
    val batch = Drift.psi(base, cur, "v", 10).as[Double].collect().head
    val lit = Drift.psiStream(cur, "v", base, "v", 10)
      .as[Double].collect().head
    assert(lit == batch)
    // and zero on identical snapshots
    assert(Drift.psiStream(base, "v", base, "v", 10)
      .as[Double].collect().head == 0.0)
    // an empty / all-null baseline names the problem instead of NPEing
    val empty = snap(Seq.empty)
    val e = intercept[IllegalArgumentException] {
      Drift.psiStream(cur, "v", empty, "v", 10)
    }
    assert(e.getMessage.contains("no non-null rows"), e.getMessage)
  }

  test("psiStream over a multi-file stream converges to the batch answer") {
    val dir = graft.core.Staging.tmpDir("drift_stream")
    val b1 = (1 to 60).map(v => (v + (v % 5)).toDouble)
    val b2 = (61 to 100).map(v => (v - (v % 3)).toDouble)
    b1.toDF("v").write.parquet(s"$dir/f1")
    b2.toDF("v").write.parquet(s"$dir/f2")
    val src = graft.core.Staging.tmpDir("drift_stream_src")
    for (f <- Seq("f1", "f2")) {
      val p = java.nio.file.Paths.get(dir, f)
      java.nio.file.Files.list(p).filter(_.toString.endsWith(".parquet"))
        .forEach(q => java.nio.file.Files.copy(q,
          java.nio.file.Paths.get(src, s"${f}_${q.getFileName}")))
    }
    val base = snap((1 to 100).map(_.toDouble))
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
      .option("maxFilesPerTrigger", 1).parquet(src)
    val streamed = graft.streaming.EventStream.runToMemory(spark,
      Drift.psiStream(stream, "v", base, "v", 10), "drift_psi_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .as[Double].collect().head
    val batch = Drift.psi(base, snap(b1 ++ b2), "v", 10)
      .as[Double].collect().head
    assert(streamed == batch)
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

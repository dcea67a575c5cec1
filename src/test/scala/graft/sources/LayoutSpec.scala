package graft.sources

import graft.SparkSpec
import graft.core.{Staging, Tables}
import org.apache.spark.sql.functions._

/** Layout audits: the properties that make a 100 TB scan cheap —
  * directory pruning from partition filters, one file per partition
  * directory, and disjoint per-file ranges for stats-based skipping.
  */
class LayoutSpec extends SparkSpec {

  private def listFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("partitioned write prunes directories at planning time") {
    val out = Staging.tmpDir("layout_prune")
    Layout.compactedPartitionedParquet(
      Tables.orders(spark, sf0001).withColumn("o_year", year(col("o_orderdate"))),
      out, Seq("o_year"))

    val years = listFiles(out).map(_.getParentFile.getName).distinct
    assert(years.forall(_.startsWith("o_year=")), s"not hive layout: $years")

    val pruned = spark.read.parquet(out).filter(col("o_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter not recognized:\n$plan")
    // the scan must touch only the matching directory's file(s)
    val touched = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(touched.forall(_.contains("o_year=1997")),
      s"scan read outside the pruned partition: ${touched.mkString(",")}")
    assert(listFiles(out).size > touched.length, "pruning had nothing to prune")
  }

  test("compacted partitioned write emits one file per partition directory") {
    val out = Staging.tmpDir("layout_compact")
    Layout.compactedPartitionedParquet(
      Tables.orders(spark, sf0001).withColumn("o_year", year(col("o_orderdate"))),
      out, Seq("o_year"))
    val perDir = listFiles(out).groupBy(_.getParentFile.getName).view.mapValues(_.size)
    assert(perDir.values.forall(_ == 1),
      s"small-file control failed, files per dir: ${perDir.toMap}")
  }

  test("range-clustered files have disjoint [min,max] on the cluster column") {
    val out = Staging.tmpDir("layout_range")
    Layout.rangeClusteredParquet(Tables.orders(spark, sf0001), out,
      "o_totalprice", files = 4)
    assert(listFiles(out).size == 4)

    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $ranges")
      case _ =>
    }
    // layout is lossless
    assert(spark.read.parquet(out).count() == Tables.orders(spark, sf0001).count())
  }

  test("z-order clustering narrows per-file spans on BOTH dimensions") {
    val out = Staging.tmpDir("layout_z")
    val orders = Tables.orders(spark, sf0001)
    Layout.zOrderClusteredParquet(orders, out, "o_custkey", "o_totalprice",
      files = 16)
    assert(listFiles(out).size == 16)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count(), "z-order layout must be lossless")

    val g = orders.agg(
      min("o_custkey").cast("double"), max("o_custkey").cast("double"),
      min("o_totalprice"), max("o_totalprice")).head()
    val (cLo, cHi, pLo, pHi) = (g.getDouble(0), g.getDouble(1), g.getDouble(2), g.getDouble(3))

    val spans = back.groupBy(input_file_name().as("f")).agg(
        ((max("o_custkey") - min("o_custkey")).cast("double") / (cHi - cLo)).as("c_span"),
        ((max("o_totalprice") - min("o_totalprice")) / (pHi - pLo)).as("p_span"))
      .collect()
    val avgC = spans.map(_.getDouble(1)).sum / spans.length
    val avgP = spans.map(_.getDouble(2)).sum / spans.length
    // a single-column sort would leave the OTHER dim's span ≈ 1.0 per
    // file; z-order must narrow both
    assert(avgC < 0.6 && avgP < 0.6,
      s"z-order did not localize both dims: custkey=$avgC totalprice=$avgP")

    // a 2-D box predicate must be servable from a strict subset of files
    val boxFiles = back
      .filter(col("o_custkey") <= (cLo + (cHi - cLo) * 0.25) &&
        col("o_totalprice") <= pLo + (pHi - pLo) * 0.25)
      .select(input_file_name()).distinct().count()
    assert(boxFiles < 16, s"box query touched all files")
  }

  test("3-dimensional z-order narrows spans on all three columns") {
    val out = Staging.tmpDir("layout_z3")
    val orders = Tables.orders(spark, sf0001)
    Layout.zOrderClusteredParquet(orders, out,
      Seq("o_custkey", "o_totalprice", "o_orderkey"), files = 16, bits = 12)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())

    def avgSpan(c: String): Double = {
      val g = orders.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      val (lo, hi) = (g.getDouble(0), g.getDouble(1))
      val spans = back.groupBy(input_file_name())
        .agg(((max(col(c)) - min(col(c))).cast("double") / (hi - lo)).as("s"))
        .collect().map(_.getDouble(1))
      spans.sum / spans.length
    }
    val (a, b, c) = (avgSpan("o_custkey"), avgSpan("o_totalprice"), avgSpan("o_orderkey"))
    assert(a < 0.8 && b < 0.8 && c < 0.8,
      s"3-D z-order left a dimension unlocalized: $a / $b / $c")
  }
}

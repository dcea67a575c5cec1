package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write pays the shuffle once, every
  * subsequent equi-join on the bucket key is exchange-free.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key has no Exchange") {
    // managed-table locations survive the previous JVM while the
    // in-memory catalog does not — clear them first
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Sinks.bucketed(Tables.lineitem(spark, sf0001), "li_b",
      Seq("l_orderkey"), buckets = 8, sortCols = Seq("l_orderkey"))
    Sinks.bucketed(Tables.orders(spark, sf0001), "o_b",
      Seq("o_orderkey"), buckets = 8, sortCols = Seq("o_orderkey"))
    val joined = spark.table("li_b")
      .join(spark.table("o_b").hint("merge"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    joined.collect() // finalize AQE plan
    val plan = joined.queryExecution.executedPlan.toString
    // the aggregation after the join still shuffles on o_orderstatus —
    // the JOIN KEYS must not: bucketing removed those exchanges
    assert(!plan.contains("hashpartitioning(l_orderkey") &&
      !plan.contains("hashpartitioning(o_orderkey"),
      s"bucketed join should not shuffle on the join keys:\n$plan")
    // values match the unbucketed join
    val expected = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(joined.as[(String, Long)].collect().toSet == expected)
  }
}

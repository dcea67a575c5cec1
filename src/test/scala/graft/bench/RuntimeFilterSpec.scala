package graft.bench

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when one join side carries a
  * selective filter, Spark can inject a bloom filter built from that
  * side into the other side's scan — rows that can't join are dropped
  * BEFORE the shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling only the ~matching
  * fraction. The thresholds are size-based (creation side small,
  * application side large), so the fixture test forces them; a real
  * deployment keeps the defaults and gets this automatically on
  * fact-scale scans.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a bloom filter into the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // fixture-size forcing only: broadcast joins don't need a runtime
      // filter (at fact scale both sides shuffle and injection is automatic)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    graft.TestSpark.withConfs(confs: _*) { s =>
      // frames built from the DERIVED session so the overrides reach
      // their planner (the withConfs contract)
      val orders = graft.core.Tables.orders(s, sf001)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val li = graft.core.Tables.lineitem(s, sf001)
        .select($"l_orderkey", $"l_quantity")
      val joined = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      // and it must not change results
      assert(joined.count() ==
        graft.core.Tables.lineitem(spark, sf001).join(
          graft.core.Tables.orders(spark, sf001)
            .filter($"o_orderpriority" === "1-URGENT"),
          $"l_orderkey" === $"o_orderkey").count())
    }
  }
}

package graft.operators

import graft.core.Tables
import org.apache.spark.sql.functions.col

class SamplingSpec extends graft.SparkSpec {

  test("hash sample keeps ~fraction, is repartition-stable, and complements exactly") {
    val o = Tables.orders(spark, sf001)
    val total = o.count()
    val n1 = Sampling.hashSample(o, "o_orderkey", 0.3).count()
    assert(math.abs(n1.toDouble / total - 0.3) < 0.02,
      s"kept $n1 of $total (${n1.toDouble / total})")
    // seeded RNG sampling loses this under repartitioning — the whole
    // point of the hash gate
    assert(Sampling.hashSample(o.repartition(7), "o_orderkey", 0.3).count() == n1)
    // the gate and its negation partition the table (consistent splitter)
    val rest = o.filter(!Sampling.hashGate(col("o_orderkey"), 0.3)).count()
    assert(n1 + rest == total)
  }

  test("disjoint fractions never overlap (consistent train/holdout)") {
    val o = Tables.orders(spark, sf001)
    val inner = Sampling.hashSample(o, "o_orderkey", 0.1)
    val outer = Sampling.hashSample(o, "o_orderkey", 0.3)
    // nested thresholds: the 10% sample is a subset of the 30% sample
    assert(inner.join(outer, Seq("o_orderkey"), "left_anti").count() == 0)
  }

  test("thresholdHex endpoints and width") {
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "ffffffff")
    assert(Sampling.thresholdHex(0.3) == "4ccccccd")
  }
}

package graft.operators

import graft.core.Tables
import org.apache.spark.sql.functions.{col, lit, when}

class SamplingSpec extends graft.SparkSpec {
  import spark.implicits._

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

  test("group-keyed gate keeps every group intact across the split (no leakage)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf001).filter(col("user_id").isNotNull)
      .withColumn("split",
        when(Sampling.hashGate(col("user_id"), 0.8), "train").otherwise("test"))
    // a user with events in both splits would leak train into holdout
    val straddlers = ev.groupBy(col("user_id"))
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0)
    assert(ev.select("split").distinct().count() == 2)
  }

  test("stratified hash sample keeps per-stratum fractions") {
    val o = Tables.orders(spark, sf001)
    val s = Sampling.stratifiedHashSample(o, "o_orderkey", "o_orderstatus",
      Map("F" -> 0.5, "O" -> 0.1, "P" -> 1.0))
    def byStatus(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = byStatus(s); val tot = byStatus(o)
    assert(math.abs(kept("F").toDouble / tot("F") - 0.5) < 0.03)
    assert(math.abs(kept("O").toDouble / tot("O") - 0.1) < 0.03)
    assert(kept("P") == tot("P")) // fraction 1.0 keeps every row
  }

  test("R1: seeded bernoulli sample is same-seed deterministic, ~fraction") {
    val o = Tables.orders(spark, sf001).select(col("o_orderkey"))
    def run() = o.sample(withReplacement = false, 0.3, 42)
      .collect().map(_.getLong(0)).toSet
    val a = run()
    assert(a == run(), "same seed must select identical membership")
    val total = o.count()
    // 5 sd of Binomial(N, .3) — the same bound the r1_sample gate asserts
    assert(math.abs(a.size - total * 0.3) <= 5 * math.sqrt(total * 0.3 * 0.7),
      s"kept ${a.size} of $total")
  }

  test("thresholdHex endpoints and width") {
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "ffffffff")
    assert(Sampling.thresholdHex(0.3) == "4ccccccd")
  }

  test("fraction 1.0 keeps EVERY row (strict-< cannot drop prefix ffffffff)") {
    // a hex threshold under strict < can never express keep-all; the
    // gate must short-circuit via the 'g' sentinel
    assert(Sampling.thresholdToken(1.0) == "g")
    val o = Tables.orders(spark, sf001)
    assert(Sampling.hashSample(o, "o_orderkey", 1.0).count() == o.count())
  }

  test("epochMix: repeats, fractional epochs, drops and uniqueness") {
    val d = Tables.documents(spark, sf001).select(col("doc_id"), col("source"))
    val m = Sampling.epochMix(d, "doc_id", "source",
      Map("src0" -> 2.3, "src1" -> 0.5, "src2" -> 0.0), default = 1.0)
    val perSource = m.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weight 2.3: every row twice plus ~30% a third time
    assert(perSource("src0") >= 2 * base("src0"))
    assert(perSource("src0") <= 3 * base("src0"))
    // weight 0.5: roughly half (25 docs/source → loose bound)
    assert(perSource("src1") > 0 && perSource("src1") < base("src1"))
    // weight 0: gone entirely
    assert(!perSource.contains("src2"))
    // default 1.0: exactly once, epoch 0
    assert(perSource("src3") == base("src3"))
    // (key, epoch) unique — the output is an explicit multiset
    assert(m.select("doc_id", "epoch").distinct().count() == m.count())
    // full epochs are unconditional: every src0 doc has epochs 0 and 1
    val fullCnt = m.filter(col("source") === "src0" && col("epoch") < 2)
      .count()
    assert(fullCnt == 2 * base("src0"))
    // deterministic under repartitioning (pure function of the row)
    assert(Sampling.epochMix(d.repartition(7), "doc_id", "source",
      Map("src0" -> 2.3, "src1" -> 0.5, "src2" -> 0.0), 1.0).count()
      == m.count())
  }

  test("weightedTopK: exact k, layout-invariant, non-positive weights excluded") {
    val d = Tables.documents(spark, sf001).select(col("doc_id"), col("n_chars"))
    val s1 = Sampling.weightedTopK(d, "doc_id", "n_chars", 50, "mix")
      .select("doc_id").as[Long].collect().toSeq
    assert(s1.length == 50 && s1.distinct.length == 50)
    val s2 = Sampling.weightedTopK(d.repartition(11), "doc_id", "n_chars",
      50, "mix").select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "sample must be a pure function of the data")
    // zero/negative weights can never be drawn
    val withBad = d.withColumn("n_chars",
      when(col("doc_id") % 2 === 0, lit(-1L)).otherwise(col("n_chars")))
    val odd = Sampling.weightedTopK(withBad, "doc_id", "n_chars", 50, "mix")
      .select("doc_id").as[Long].collect()
    assert(odd.forall(_ % 2 == 1))
  }

  test("weightedTopK: inclusion probability grows with weight") {
    // planted skew: one heavy item (w=1000) among 500 light (w=1);
    // across 40 seeds the heavy item must appear far more often than
    // any light one would by chance (k=5 of 501)
    val d = spark.range(0, 501).select(col("id").as("doc_id"),
      when(col("id") === 0, 1000L).otherwise(1L).as("w"))
    val hits = (0 until 40).count { s =>
      Sampling.weightedTopK(d, "doc_id", "w", 5, s"seed$s")
        .select("doc_id").as[Long].collect().contains(0L)
    }
    // P(include | w=1000 vs 500 light) ≈ 1; light-item rate ≈ 1%
    assert(hits >= 35, s"heavy item sampled only $hits/40 times")
  }

  test("weightedTopKPerStratum: k per stratum, same key as the global draw") {
    val d = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val s = Sampling.weightedTopKPerStratum(d, "doc_id", "lang", "n_chars",
      5, "mix")
    val perLang = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    val langs = d.select("lang").distinct().as[String].collect()
    assert(langs.forall(l => perLang(l) == 5L))
    // stratum rank agrees with the global key: a stratum's members are
    // its k best GLOBAL keys restricted to the stratum
    val globalKeys = Sampling.weightedTopK(d, "doc_id", "n_chars",
      d.count().toInt, "mix")
      .select("doc_id", "lang", "es_key")
      .as[(Long, String, Double)].collect()
    val want = globalKeys.groupBy(_._2).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(5).map(_._1).toSeq
    }.toSet
    assert(s.select("doc_id").as[Long].collect().toSet == want)
  }

  test("weightedTopKPerStratum plans as a partial-combining aggregate, not a window") {
    val d = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val q = Sampling.weightedTopKPerStratum(d, "doc_id", "lang", "n_chars",
      5, "mix")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "stratum top-k must not ship every row through a rank window")
    assert(plan.contains("partial_top_k_structs") ||
      plan.contains("top_k_structs"), plan.take(800))
  }

  test("weightedTopK plans as TakeOrderedAndProject (k rows cross the wire)") {
    val d = Tables.documents(spark, sf001).select(col("doc_id"), col("n_chars"))
    val q = Sampling.weightedTopK(d, "doc_id", "n_chars", 10)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }
}

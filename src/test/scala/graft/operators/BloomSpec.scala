package graft.operators

import org.apache.spark.sql.functions._

class BloomSpec extends graft.SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 200L).map(i => (i, s"doc number $i payload"))
    .toDF("id", "key")
  private def store = (1L to 200L).filter(_ % 3 == 0)
    .map(i => (i, s"doc number $i payload")).toDF("sid", "skey")

  private def exactKept = (1L to 200L).filterNot(_ % 3 == 0).toSet

  test("bloom anti-join equals the exact anti-join") {
    val kept = Bloom.antiJoinWithBloom(corpus, "key", store, "skey",
      expectedItems = 1024)
      .select("id").as[Long].collect().toSet
    assert(kept == exactKept)
  }

  test("an undersized filter forces false positives; the recheck removes them") {
    // expectedItems=2 for a 66-key store → tiny bit array, fp rate ≈ 1
    val bf = Bloom.buildBytes(store, col("skey"), expectedItems = 2,
      fpp = 0.5).get
    val positives = corpus.filter(Bloom.mightContain(bf, col("key"))).count()
    assert(positives > 66, s"expected bloom false positives, got $positives")
    // no false negatives ever: every true store key probes positive
    val storeHits = store.filter(Bloom.mightContain(bf, col("skey"))).count()
    assert(storeHits == 66L)
    // and the composed operator still returns the exact answer
    val kept = Bloom.antiJoinWithBloom(corpus, "key", store, "skey",
      expectedItems = 2, fpp = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == exactKept)
  }

  test("empty store keeps the corpus verbatim") {
    val kept = Bloom.antiJoinWithBloom(corpus, "key",
      store.filter(lit(false)), "skey", expectedItems = 16)
      .select("id").as[Long].collect().toSet
    assert(kept == (1L to 200L).toSet)
  }

  test("a filter larger than the runtime-join conf caps actually gets built") {
    // BloomFilterAggregate clamps numItems/numBits against the
    // runtime-join bloom confs (4M items / 8 MB default); buildBytes
    // must lift them for the build or a 10⁸-key store filter silently
    // degrades. 10⁸ items at 1% fpp ⇒ ~9.6e8 bits ≈ 120 MB — well past
    // the 8 MB clamp; the serialized blob proves which size was built.
    val confKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val before = spark.conf.getOption(confKey)
    val bf = Bloom.buildBytes(store, col("skey"),
      expectedItems = 100L * 1000 * 1000).get
    assert(bf.length > 100 * 1024 * 1024,
      s"filter was clamped: ${bf.length} bytes")
    // and the conf is back to its pre-build value (runtime-join
    // filters in the session keep their intended bound)
    assert(spark.conf.getOption(confKey) == before)
    // no false negatives through the big filter
    assert(store.filter(Bloom.mightContain(bf, col("skey"))).count() == 66L)
  }

  test("size guard fails fast on an over-budget filter") {
    val e = intercept[IllegalArgumentException] {
      Bloom.buildBytes(store, col("skey"), expectedItems = 10L * 1000 * 1000 * 1000,
        fpp = 0.001, maxFilterBytes = 1 << 20)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("the clean branch is a map-side filter — no join above its scan") {
    val bf = Bloom.buildBytes(store, col("skey"), expectedItems = 1024).get
    // range-backed corpus: a Seq-backed LocalRelation would be folded
    // away by ConvertToLocalRelation and leave no plan to audit
    val scanned = spark.range(1, 201)
      .select(col("id"), concat(lit("doc number "), col("id"),
        lit(" payload")).as("key"))
    val clean = scanned.filter(!Bloom.mightContain(bf, col("key")))
    clean.collect()
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.contains("Join"), plan.take(500))
    // and the probe stays inside whole-stage codegen (the `*(n)` span
    // marker in the executed plan's compact rendering); the stage
    // NUMBER is an implementation detail — match any
    assert("""\*\(\d+\) Filter""".r.findFirstIn(plan).isDefined, plan.take(500))
  }
}

package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  /** Separable toy data: label decided by category + sign of x. */
  private def toy(n: Int) = {
    val rng = new scala.util.Random(7)
    (1 to n).map { i =>
      val cat = if (rng.nextBoolean()) "A" else "B"
      val x = rng.nextDouble() * 2 - 1
      val label = if (cat == "A" && x > 0) "pos" else "neg"
      (cat, x, label)
    }.toDF("cat", "x", "label")
  }

  private val cfg = FeaturePipeline.Config(
    labelCol = "label", categoricalCols = Seq("cat"), continuousCols = Seq("x"),
    hiddenLayers = Seq(8), numClasses = 3, maxIter = 100)

  test("M1–M6: pipeline learns a separable concept (accuracy > 0.9)") {
    val Array(train, test) = toy(2000).randomSplit(Array(0.8, 0.2), 42L)
    val model = FeaturePipeline.fit(train.cache(), cfg)
    val scored = CombinationSearch.scoreWithLabels(model, test)
    val m = ConfusionMatrix.compute(scored, "label", "prediction_label", "pos")
    assert(m.accuracy > 0.9, s"accuracy ${m.accuracy}")
    assert(m.tp > 0 && m.tn > 0)
  }

  test("hash rebalance/split membership is invariant to partition layout") {
    val df = toy(1000).withColumn("k", monotonically_increasing_id())
    val layouts = Seq(df, df.repartition(7), df.coalesce(1))
    // identical member sets regardless of physical layout — the property
    // that makes the ml1_confusion golden gate stable across core counts
    // (seeded sample/randomSplit do NOT have it: per-partition RNG)
    val trainSets = layouts.map(d =>
      FeaturePipeline.hashSplit(d, col("k"), 80)._1
        .select("k").as[Long].collect().sorted.toSeq)
    assert(trainSets.distinct.size == 1)
    val balancedSets = layouts.map(d =>
      FeaturePipeline.rebalanceHash(d, "label", "neg", 50, col("k"))
        .select("k").as[Long].collect().sorted.toSeq)
    assert(balancedSets.distinct.size == 1)
    // split is a partition: train ∪ test = all, train ∩ test = ∅
    val (tr, te) = FeaturePipeline.hashSplit(df, col("k"), 80)
    assert(tr.count() + te.count() == df.count())
    assert(tr.join(te, "k").count() == 0)
    // only the majority class is downsampled
    val bal = FeaturePipeline.rebalanceHash(df, "label", "neg", 50, col("k"))
    assert(bal.filter($"label" === "pos").count() == df.filter($"label" === "pos").count())
    assert(bal.filter($"label" === "neg").count() < df.filter($"label" === "neg").count())
  }

  test("M4: feature width = onehot(keep) + continuous") {
    val df = toy(100)
    val features = new org.apache.spark.ml.Pipeline()
      .setStages(FeaturePipeline.featureStages(cfg).toArray).fit(df)
    // 2 categories + 1 'keep' slot, onehot dropLast → 2; plus x → 3
    assert(FeaturePipeline.featureWidth(features.transform(df)) == 3)
  }

  test("M3: quantile discretizer buckets a continuous feature into n bins") {
    val df = toy(500)
    val qcfg = cfg.copy(continuousCols = Seq("x"), quantileBuckets = Map("x" -> 4))
    val features = new org.apache.spark.ml.Pipeline()
      .setStages(FeaturePipeline.featureStages(qcfg).toArray).fit(df)
    val out = features.transform(df)
    val bins = out.select("x_qbkt").distinct().count()
    assert(bins >= 3 && bins <= 4) // ~4 quantile bins on continuous data
    // width: onehot(2+keep dropLast=2) + 1 discretized = 3
    assert(FeaturePipeline.featureWidth(out) == 3)
  }

  test("M7: confusion metrics handle zero denominators like the reference") {
    val scored = Seq(("pos", "pos"), ("pos", "pos"), ("pos", "neg"))
      .toDF("label", "pred")
    val m = ConfusionMatrix.compute(scored, "label", "pred", "pos")
    assert(m.tp == 2 && m.fn == 1 && m.tn == 0 && m.fp == 0)
    assert(m.specificity == 0.0 && m.npv == 0.0) // 0-denominator → 0, not NaN
    assert(math.abs(m.accuracy - 2.0 / 3.0) < 1e-12)
  }

  test("M8: combination search trains one model per combo") {
    val withExtra = toy(600).withColumn("cat2",
      when($"x" > 0.5, "H").otherwise("L"))
    val Array(train, test) = withExtra.randomSplit(Array(0.8, 0.2), 42L)
    val results = CombinationSearch.search(train.cache(), test.cache(),
      cfg.copy(maxIter = 20), Seq("cat", "cat2"), maxK = 2, positive = "pos")
    assert(results.map(_.features).toSet ==
      Set(Seq("cat"), Seq("cat2"), Seq("cat", "cat2")))
    assert(results.forall(r => r.metrics.accuracy >= 0.0 && r.seconds > 0))
  }

  test("R1/U1: rebalance downsamples only the majority class") {
    val df = toy(1000)
    val balanced = FeaturePipeline.rebalance(df, "label", "neg", 0.3, 42L)
    val counts = balanced.groupBy("label").count().as[(String, Long)].collect().toMap
    val orig = df.groupBy("label").count().as[(String, Long)].collect().toMap
    assert(counts("pos") == orig("pos"))
    assert(counts("neg") < orig("neg"))
  }
}

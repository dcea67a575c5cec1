package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.{IndexToString, StringIndexerModel}
import org.apache.spark.sql.DataFrame

/** M8 — feature-combination search: train + evaluate one model per
  * combination of categorical features (the reference loops
  * itertools.combinations for k=1..5, 31 models,
  * MLPCModel-3.py:516-522). Each iteration reuses the cached
  * train/test frames; only the feature columns change.
  */
object CombinationSearch {

  final case class Result(features: Seq[String], metrics: ConfusionMatrix.Metrics,
                          seconds: Double)

  /** C10 done right: map prediction indices back through the fitted
    * label indexer's own labels (no assumption about frequency order).
    */
  def scoreWithLabels(model: PipelineModel, test: DataFrame): DataFrame = {
    val featModel = model.stages(0).asInstanceOf[PipelineModel]
    val labels = featModel.stages(0).asInstanceOf[StringIndexerModel].labelsArray(0)
    new IndexToString().setInputCol("prediction")
      .setOutputCol("prediction_label").setLabels(labels)
      .transform(model.transform(test))
  }

  /** M8's combination enumeration without the per-combo classifier
    * cost: the fitted feature width per categorical combination.
    * Width is the quantity the search actually varies (and what sets
    * each model's layer-0 size), and unlike the trained metrics it is
    * deterministic — so it can be oracle-gated; the classifier side of
    * the loop is covered by MlSpec.
    *
    * Indexers/encoders are fitted ONCE for the union of candidate
    * columns — a StringIndexer/OneHotEncoder fit depends only on
    * (data, its column), so per-combo models are identical to
    * per-combo fits, and the k=1..maxK enumeration (31 fits in the
    * reference's loop) pays one pass over the data instead of 31.
    * Width then comes from the assembler's METADATA propagation
    * (encoder vec sizes are in the schema), no per-combo job at all.
    */
  def comboWidths(df: DataFrame, base: FeaturePipeline.Config,
                  candidateCats: Seq[String], maxK: Int): Seq[(String, Int)] = {
    val combos = (1 to maxK).flatMap(k => candidateCats.combinations(k))
    val prep = new org.apache.spark.ml.Pipeline()
      .setStages(FeaturePipeline.prepStages(
        base.copy(categoricalCols = candidateCats)).toArray).fit(df)
    val prepped = prep.transform(df)
    combos.map { cats =>
      val cfg = base.copy(categoricalCols = cats)
      (cats.mkString("+"),
        FeaturePipeline.featureWidth(FeaturePipeline.assembler(cfg).transform(prepped)))
    }
  }

  /** One distributed MLPC fit + score + metrics per categorical
    * combination, with the invariant feature stages (label indexer,
    * per-column indexers/encoders/bucketizers) fitted once for the
    * union of candidates and their transforms cached — each combo then
    * only assembles its column subset and fits its classifier. Fit-
    * equivalent to a full per-combo pipeline fit (stage fits are
    * per-column; the MLPC sees byte-identical features and seed).
    */
  /** @param parallelism combos fitted concurrently (CrossValidator's
    *                     idiom: independent small fits interleave their
    *                     per-iteration jobs, so the cluster stays busy
    *                     while any one optimizer is between jobs). Each
    *                     fit is seed-deterministic and reads only
    *                     cached frames, so results are independent of
    *                     scheduling order.
    */
  def search(train: DataFrame, test: DataFrame, base: FeaturePipeline.Config,
             candidateCats: Seq[String], maxK: Int,
             positive: String, parallelism: Int = 1): Seq[Result] = {
    require(parallelism >= 1, s"parallelism must be >= 1: $parallelism")
    val combos = (1 to maxK).flatMap(k => candidateCats.combinations(k))
    val prep = new org.apache.spark.ml.Pipeline()
      .setStages(FeaturePipeline.prepStages(
        base.copy(categoricalCols = candidateCats)).toArray).fit(train)
    val labels = prep.stages(0).asInstanceOf[StringIndexerModel].labelsArray(0)
    // right-size ONCE for the whole search: ~100 jobs per fitted model
    // read these frames, so partition count follows row count, not the
    // session's shuffle width (FeaturePipeline.sizedForFit). Cache
    // BEFORE sizing so the sizing count populates the cache rather
    // than materializing the prep transform an extra time.
    val trainPrepBase = prep.transform(train).cache()
    val trainPrep = FeaturePipeline.sizedForFit(trainPrepBase)
    val testPrep = prep.transform(test).cache()
    def one(cats: Seq[String]): Result = {
      val t0 = System.nanoTime()
      val cfg = base.copy(categoricalCols = cats)
      val asm = FeaturePipeline.assembler(cfg)
      val assembled = asm.transform(trainPrep)
      val width = FeaturePipeline.featureWidth(assembled)
      val mlpc = new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
        .setLabelCol("indexedLabel").setFeaturesCol("features")
        .setLayers((width +: cfg.hiddenLayers :+ cfg.numClasses).toArray.map(_.toInt))
        .setSeed(cfg.seed).setMaxIter(cfg.maxIter)
      val model = mlpc.fit(assembled)
      val scored = new IndexToString().setInputCol("prediction")
        .setOutputCol("prediction_label").setLabels(labels)
        .transform(model.transform(asm.transform(testPrep)))
      val m = ConfusionMatrix.compute(scored, cfg.labelCol, "prediction_label", positive)
      Result(cats, m, (System.nanoTime() - t0) / 1e9)
    }
    try {
      if (parallelism == 1) combos.map(one)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try {
          val futures = combos.map(c => scala.concurrent.Future(one(c)))
          futures.map(f => scala.concurrent.Await.result(
            f, scala.concurrent.duration.Duration.Inf))
        } finally pool.shutdown()
      }
    } finally {
      trainPrepBase.unpersist(blocking = false)
      testPrep.unpersist(blocking = false)
    }
  }
}

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
    */
  def comboWidths(df: DataFrame, base: FeaturePipeline.Config,
                  candidateCats: Seq[String], maxK: Int): Seq[(String, Int)] = {
    val combos = (1 to maxK).flatMap(k => candidateCats.combinations(k))
    combos.map { cats =>
      val cfg = base.copy(categoricalCols = cats)
      val features = new org.apache.spark.ml.Pipeline()
        .setStages(FeaturePipeline.featureStages(cfg).toArray).fit(df)
      (cats.mkString("+"), FeaturePipeline.featureWidth(features.transform(df)))
    }
  }

  def search(train: DataFrame, test: DataFrame, base: FeaturePipeline.Config,
             candidateCats: Seq[String], maxK: Int,
             positive: String): Seq[Result] = {
    val combos = (1 to maxK).flatMap(k => candidateCats.combinations(k))
    combos.map { cats =>
      val t0 = System.nanoTime()
      val cfg = base.copy(categoricalCols = cats)
      val model = FeaturePipeline.fit(train, cfg)
      val scored = scoreWithLabels(model, test)
      val m = ConfusionMatrix.compute(scored, cfg.labelCol, "prediction_label", positive)
      Result(cats, m, (System.nanoTime() - t0) / 1e9)
    }
  }
}

package graft.ml

import graft.selection.Dsir
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** fastText-style quality classifier over hashed n-gram features — the
  * model-based corpus filter (GPT-3 §2.2 / LLaMA-style "quality
  * classifier" curation stage): train a linear classifier on a small
  * labeled sample (reference corpus = positive, random crawl = the
  * negative), then score the whole corpus and keep the high-probability
  * tail.
  *
  * Scale shape: the feature space is the SAME fixed hashed-bucket space
  * as [[graft.selection.Dsir]] (model size = `buckets` coefficients,
  * independent of corpus size), so the trained model rides to
  * executors as one small closure and SCORING IS MAP-SIDE — at 100 TB
  * the fit runs on a bounded labeled sample while the expensive pass,
  * scoring 130 B documents, adds zero shuffles beyond the two bounded
  * aggregations that build each document's sparse count vector.
  *
  * Determinism discipline (the ml1 golden-gate contract): train/test
  * membership is hash-of-key (layout-invariant), and
  * [[fitDeterministic]] funnels the (small) training sample into ONE
  * sorted partition so LBFGS sees an identical gradient sequence on 4
  * cores or 4,000 — confusion cells are then frozen as a VALUES
  * oracle, and any numeric drift in the feature/fit path fails the
  * gate.
  */
object TextClassifier {

  val DefaultBuckets: Int = Dsir.DefaultBuckets

  /** (id, features) — per-document sparse vector of ln(1+count) over
    * hashed unigram+bigram buckets ([[Dsir.hashedFeatures]] space).
    * Two bounded shuffles: an (id, bucket) count and the per-id
    * assembly; indices are sorted in the group fold, so the vector is
    * a pure function of the document text.
    */
  def hashedVectors(df: DataFrame, idCol: String, textCol: String,
                    buckets: Int = DefaultBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Dsir.hashedFeatures(df, idCol, textCol, buckets)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
      .select(col(idCol).cast("long"), col("bucket").cast("int"),
        col("cnt").cast("double"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val arr = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        (id, Vectors.sparse(buckets,
          arr.map(_._1), arr.map(v => math.log1p(v._2))))
      }
      .toDF(idCol, "features")
  }

  /** Fit a logistic model on a SMALL labeled sample (features, label)
    * with a deterministic physical layout: everything into one
    * partition, sorted by `idCol` — the gradient fold order is then a
    * pure function of the data, never the cluster width. The sample is
    * small by construction (it's hand- or heuristic-labeled); the
    * corpus-sized work belongs in [[hashedVectors]] + scoring, not the
    * fit.
    */
  def fitDeterministic(labeled: DataFrame, idCol: String,
                       maxIter: Int = 100,
                       regParam: Double = 1e-3): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(labeled.repartition(1).sortWithinPartitions(col(idCol)))

  /** Map-side corpus scoring: adds `probability` (P(label=1)) and
    * `prediction` to the vectors frame. ONLY the `buckets`-sized
    * coefficient array, the intercept, and the threshold ride in the
    * task closure — `model.transform` would serialize the model object
    * itself, whose training summary holds the fitting DataFrame and so
    * drags the (non-serializable) session into the closure.
    *
    * Numerics match `model.transform` bit-for-bit on the sparse vectors
    * [[hashedVectors]] emits: margin = ascending-index dot (BLAS sparse
    * order) + intercept, probability = sigmoid, predict at
    * `model.getThreshold`.
    */
  def score(model: LogisticRegressionModel, vectors: DataFrame): DataFrame = {
    require(model.numClasses == 2, "binary models only")
    val coef = model.coefficients.toArray
    val intercept = model.intercept
    val threshold = model.getThreshold
    val idx = vectors.schema.fieldIndex("features")
    val outSchema = vectors.schema
      .add("probability", org.apache.spark.sql.types.DoubleType)
      .add("prediction", org.apache.spark.sql.types.DoubleType)
    vectors.map { row =>
      val f = row.getAs[org.apache.spark.ml.linalg.Vector](idx)
      var m = 0.0
      f.foreachActive((i, v) => m += coef(i) * v)
      m += intercept
      val p = 1.0 / (1.0 + math.exp(-m))
      val pred = if (p > threshold) 1.0 else 0.0
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ p :+ pred)
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Distributed confusion census over a scored frame (label,
    * prediction as doubles): 4 rows out of any corpus size.
    */
  def confusionCells(scored: DataFrame): DataFrame =
    scored.groupBy(col("label").cast("int").as("label"),
        col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("cnt"))
}

package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.attribute.AttributeGroup
import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
import org.apache.spark.ml.feature._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML feature/classifier pipeline (SURVEY.md §2.13 M1–M8): label +
  * categorical indexing (`handleInvalid='keep'`, matching the
  * reference so category arity — and therefore the MLPC input width —
  * is reproducible), one-hot encoding, optional bucketing of a
  * continuous column, vector assembly, MLPC with the layer-0 width
  * read from the assembler's attribute metadata
  * (LAB-2022-Standalone-SparkML-CSV-to-MLPCModel-3.ipynb cell 115).
  */
object FeaturePipeline {

  final case class Config(
      labelCol: String,
      categoricalCols: Seq[String],
      continuousCols: Seq[String],
      buckets: Map[String, Array[Double]] = Map.empty,
      // data-driven alternative to explicit splits (the reference
      // imports QuantileDiscretizer but never instantiates it —
      // SURVEY §2.13 M3; we support both)
      quantileBuckets: Map[String, Int] = Map.empty,
      hiddenLayers: Seq[Int] = Seq(5),
      numClasses: Int = 2,
      seed: Long = 42L,
      maxIter: Int = 40)

  /** Pre-assembly stages: label/categorical indexers → encoders →
    * bucketizers. Each fit depends only on (train, its column), NOT on
    * which combination of columns later feeds the assembler — which is
    * what lets the combination search fit them ONCE for the union of
    * candidate columns instead of once per combo.
    */
  def prepStages(cfg: Config): Seq[PipelineStage] = {
    require(cfg.buckets.keySet.intersect(cfg.quantileBuckets.keySet).isEmpty,
      "a column may use explicit OR quantile buckets, not both: " +
        cfg.buckets.keySet.intersect(cfg.quantileBuckets.keySet).mkString(","))
    val labelIndexer = new StringIndexer()
      .setInputCol(cfg.labelCol).setOutputCol("indexedLabel")
      .setHandleInvalid("keep")
    val catIndexers = cfg.categoricalCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep"))
    val encoders = cfg.categoricalCols.map(c =>
      new OneHotEncoder().setInputCol(s"${c}_idx").setOutputCol(s"${c}_vec"))
    val bucketizers = cfg.buckets.toSeq.map { case (c, splits) =>
      new Bucketizer().setInputCol(c).setOutputCol(s"${c}_bkt").setSplits(splits)
    }
    val discretizers = cfg.quantileBuckets.toSeq.map { case (c, n) =>
      new QuantileDiscretizer().setInputCol(c).setOutputCol(s"${c}_qbkt")
        .setNumBuckets(n)
    }
    (labelIndexer +: catIndexers) ++ encoders ++ bucketizers ++ discretizers
  }

  /** Assembler producing `features` from the prep stages' outputs. */
  def assembler(cfg: Config): VectorAssembler = {
    val inputCols =
      cfg.categoricalCols.map(c => s"${c}_vec") ++
        cfg.continuousCols.filterNot(c =>
          cfg.buckets.contains(c) || cfg.quantileBuckets.contains(c)) ++
        cfg.buckets.keys.map(c => s"${c}_bkt") ++
        cfg.quantileBuckets.keys.map(c => s"${c}_qbkt")
    new VectorAssembler().setInputCols(inputCols.toArray).setOutputCol("features")
  }

  /** Feature stages only (no classifier): indexers → encoders →
    * bucketizers → assembler producing `features`.
    */
  def featureStages(cfg: Config): Seq[PipelineStage] =
    prepStages(cfg) :+ assembler(cfg)

  /** M4 — assembled feature width from attribute metadata. */
  def featureWidth(assembled: DataFrame): Int =
    AttributeGroup.fromStructField(assembled.schema("features")).size

  /** Right-size a training frame's partitioning to DATA VOLUME before
    * an iterative fit. An LBFGS-style optimizer launches one job per
    * gradient evaluation (~100–200 for MLPC at maxIter 100), so a
    * session-width partitioning of a small frame pays per-task overhead
    * on every iteration for partitions holding a few thousand rows
    * (measured: a 60 k-row train set fits ~35% faster at its natural
    * 1 partition than at 32). A rebalanced/split training set is
    * routinely orders of magnitude smaller than the corpus that
    * produced it — at 100 TB the same rule keeps the fit wide, because
    * the row count, not the session default, sets the width.
    *
    * Callers that cache should cache BEFORE calling (and unpersist that
    * same frame): the sizing `count()` then populates the cache instead
    * of running the lineage one extra time, and the returned coalesce
    * is a narrow read over the cached blocks.
    */
  def sizedForFit(train: DataFrame, rowsPerPartition: Long = 65536): DataFrame = {
    val target = math.max(1L,
      (train.count() + rowsPerPartition - 1) / rowsPerPartition).toInt
    if (target < train.rdd.getNumPartitions) train.coalesce(target) else train
  }

  /** M5/M6 — fit features, read width, fit MLPC, return the composed
    * model. Two fits are unavoidable because MLPC needs `layers` up
    * front; the feature transform of the training frame is reused.
    */
  def fit(train: DataFrame, cfg: Config): PipelineModel = {
    val features = new Pipeline().setStages(featureStages(cfg).toArray).fit(train)
    val assembled = features.transform(train)
    val width = featureWidth(assembled)
    val mlpc = new MultilayerPerceptronClassifier()
      .setLabelCol("indexedLabel").setFeaturesCol("features")
      .setLayers((width +: cfg.hiddenLayers :+ cfg.numClasses).toArray.map(_.toInt))
      .setSeed(cfg.seed).setMaxIter(cfg.maxIter)
    val model = mlpc.fit(assembled)
    new Pipeline().setStages(Array(features, model)).fit(train.limit(0))
  }

  /** Class rebalancing (R1/U1): seeded with-replacement downsample of
    * the majority class unioned with the rest — the reference's
    * sample(True, 0.3, 42) + union idiom (MLPCModel-3.py:344,356).
    */
  def rebalance(df: DataFrame, labelCol: String, majority: String,
                fraction: Double, seed: Long): DataFrame = {
    val maj = df.filter(col(labelCol) === majority)
      .sample(withReplacement = true, fraction, seed)
    df.filter(col(labelCol) =!= majority).union(maj)
  }

  /** Deterministic bucket 0..99 from a stable key. Spark's seeded
    * sample/randomSplit draw per-PARTITION random streams, so their
    * output changes with the physical partition layout (file split
    * sizing varies with core count). Hashing a stable key instead
    * makes splits a pure function of the DATA — reproducible on 4
    * cores or 4,000, and the standard reproducible-split idiom for a
    * 100 TB training pipeline (a re-run after a cluster resize must
    * not reshuffle train/test membership).
    */
  def hashBucket(key: Column, salt: Int, buckets: Int = 100): Column =
    pmod(hash(key, lit(salt)), lit(buckets))

  /** [[rebalance]] with partition-invariant membership: keep
    * `keepPct`% of the majority class, selected by key hash.
    */
  def rebalanceHash(df: DataFrame, labelCol: String, majority: String,
                    keepPct: Int, key: Column, salt: Int = 7): DataFrame =
    df.filter(col(labelCol) =!= majority)
      .union(df.filter(col(labelCol) === majority)
        .filter(hashBucket(key, salt) < keepPct))

  /** R2 with partition-invariant membership: (train, test) split on
    * key hash, `trainPct`% to train.
    */
  def hashSplit(df: DataFrame, key: Column, trainPct: Int,
                salt: Int = 13): (DataFrame, DataFrame) = {
    val b = hashBucket(key, salt)
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }
}

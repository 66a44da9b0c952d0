package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.RelationalQueries

/** The outcome-classifier dataflow (reference C4, ct_estimator.py:40-160)
  * re-expressed as one Spark ML `Pipeline`: one-hot indicator columns over
  * the integer categorical codes (reference M4), numeric passthrough into
  * a `VectorAssembler` (M5), and a DNN with the reference's 5×8 topology
  * (M8) — here `MultilayerPerceptronClassifier`.
  *
  * Label: order finished ('F') vs not — the Completed/Terminated binary of
  * the reference (ct_data.py:28-29,119-120) re-expressed on the star
  * schema. The feature frame is the q06 star-features relation, so the
  * whole extract→encode→train lineage is a single Catalyst plan feeding
  * the ML stage (no intermediate materialization).
  */
object OutcomePipeline {

  val categoricalCols: Seq[String] = Seq("priority_code", "segment_code", "epoch_bucket")
  val numericCols: Seq[String] = Seq("li_count", "supplier_count", "part_count", "revenue")

  /** Feature frame + binary label, derived from the q06 star features.
    * Rows with status O/P (not finished) get label 0; F gets 1. */
  def featureFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.q06StarFeatures(spark, dir)
      .withColumn("label", when($"status_code" === 0, 1.0).otherwise(0.0))
  }

  /** Feature-preparation pipeline: one-hot the categorical codes (M4),
    * assemble with the numeric passthroughs (M5). */
  def featurePipeline: Pipeline = {
    val encoder = new OneHotEncoder()
      .setInputCols(categoricalCols.toArray)
      .setOutputCols(categoricalCols.map(_ + "_oh").toArray)
      .setHandleInvalid("keep")
    val assembler = new VectorAssembler()
      .setInputCols((numericCols ++ categoricalCols.map(_ + "_oh")).toArray)
      .setOutputCol("features")
    new Pipeline().setStages(Array(encoder, assembler))
  }

  /** The reference's train topology: 5 hidden layers × 8 units, 2 classes
    * (ct_estimator.py:117-120). */
  def classifier(inputSize: Int): MultilayerPerceptronClassifier =
    new MultilayerPerceptronClassifier()
      .setLayers(Array(inputSize, 8, 8, 8, 8, 8, 2))
      .setBlockSize(100) // reference batch_size=100 (ct_estimator.py:33)
      .setMaxIter(60)
      .setSeed(42L)
      .setFeaturesCol("features")
      .setLabelCol("label")

  /** Reference split fractions 0.7 / 0.005 / rest (ct_data.py:152) via
    * randomSplit; seeds pinned (SURVEY §7.4.7 — assert fractions, not
    * membership). Returns (accuracy-on-test, rowCounts). */
  def trainEval(spark: SparkSession, dir: String, seed: Long = 42L): (Double, (Long, Long, Long)) = {
    val frame = featureFrame(spark, dir).cache()
    val Array(train, validate, test) =
      frame.randomSplit(Array(0.7, 0.005, 0.295), seed)

    val prep = featurePipeline.fit(train)
    val trainVec = prep.transform(train).cache()
    // input width read off the actual assembled vector (one-hot sizes
    // depend on observed categories + handleInvalid=keep)
    val inputSize = trainVec.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0).size

    val model = classifier(inputSize).fit(trainVec)
    val predictions = model.transform(prep.transform(test))
    val accuracy = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("accuracy")
      .evaluate(predictions)
    (accuracy, (train.count(), validate.count(), test.count()))
  }
}

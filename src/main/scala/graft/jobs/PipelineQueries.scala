package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.Kda
import graft.multimodal.Multimodal

/** Pipeline-layer queries: multimodal plumbing + key-driver analysis
  * exposed through the driver contract.
  */
object PipelineQueries {

  // ---------------------------------------------------------------- q28
  /** Multimodal metadata extraction through the REAL batched-decode path
    * (Dataset.mapPartitions with the stubbed codec): binary payload →
    * typed features. Oracle checks the payload arithmetic in SQL. */
  def q28MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.toMediaTable(Tables.load(spark, dir, "documents"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFeatures(media)
      .select($"doc_id", $"n_bytes", $"width", $"height")
  }

  // ---------------------------------------------------------------- q29
  /** Johnson relative weights of lineitem measures vs revenue — the
    * distributed-correlation + driver-eigendecomposition split (SURVEY
    * M2). Not SQL-expressible (eigendecomposition) → rows-only check;
    * exactness pinned in MlSpec. */
  def q29KdaWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("revenue", $"l_extendedprice" * (lit(1) - $"l_discount"))
    val weights = Kda.relativeWeights(li, target = "revenue",
      features = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    weights.toDF("feature", "rel_weight")
      .select($"feature", round($"rel_weight", 4).as("rel_weight"))
  }

  // ================================================================ maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_multimodal_meta" -> (q28MultimodalMeta _),
    "q29_kda_weights" -> (q29KdaWeights _))

  val oracle: Map[String, String] = Map(
    "q28_multimodal_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
         CAST(64 + (octet_length(encode(text)) * 31) % 411 AS INTEGER) AS height
         FROM documents""")
}

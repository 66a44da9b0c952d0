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
  /** Johnson relative weights — the distributed-correlation +
    * driver-eigendecomposition split (SURVEY M2), run through the SAME
    * generic [[Kda.relativeWeights]] path as any k. This query uses
    * k=2 (quantity, discount → revenue), for which the k×k matrix
    * square root has a closed form — so the eigendecomposition itself
    * becomes oracle-checkable in SQL:
    * for R=[[1,r],[r,1]], Λ=R^{1/2}=[[a,b],[b,a]] with
    * a=(√(1+r)+√(1-r))/2, b=(√(1+r)-√(1-r))/2; β=Λ⁻¹·r_xy;
    * ε₁=a²β₁²+b²β₂², ε₂=b²β₁²+a²β₂². The k=4 path (no closed form)
    * stays pinned against a hand-checked fixture in MlSpec. */
  def q29KdaWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread (guide §2.5): the correlation pass converts every row to an
    // ML vector — CPU-dense per row, serialized on a single-split scan
    val li = graft.operators.Spread.cpuBound(Tables.load(spark, dir, "lineitem"))
      .withColumn("revenue", $"l_extendedprice" * (lit(1) - $"l_discount"))
    val weights = Kda.relativeWeights(li, target = "revenue",
      features = Seq("l_quantity", "l_discount"))
    weights.toDF("feature", "rel_weight")
      .select($"feature", round($"rel_weight", 4).as("rel_weight"))
  }

  // ---------------------------------------------------------------- q35
  /** Multimodal frame sampling through the REAL batched-decode path
    * (Dataset.mapPartitions, stubbed codec): each payload fans into
    * 1..4 evenly-strided frames with a per-frame byte-window feature.
    * The oracle reproduces the geometry and byte math in SQL (the
    * expression twin [[Multimodal.frameSampleExpr]] is spec-proven
    * byte-identical to this path). */
  def q35FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.toMediaTable(Tables.load(spark, dir, "documents"))
      .as[Multimodal.MediaRow]
    Multimodal.sampleFrames(media, maxFrames = 4).toDF()
  }

  // ================================================================ maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_multimodal_meta" -> (q28MultimodalMeta _),
    "q29_kda_weights" -> (q29KdaWeights _),
    "q35_frame_sample" -> (q35FrameSample _))

  val oracle: Map[String, String] = Map(
    "q28_multimodal_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
         CAST(64 + (octet_length(encode(text)) * 31) % 411 AS INTEGER) AS height
         FROM documents""",
    "q29_kda_weights" ->
      """WITH c AS (
           SELECT corr(l_quantity, l_discount) AS r,
             corr(l_quantity, l_extendedprice*(1-l_discount)) AS r1y,
             corr(l_discount, l_extendedprice*(1-l_discount)) AS r2y
           FROM lineitem),
         f AS (
           SELECT r1y, r2y,
             (sqrt(1+r)+sqrt(1-r))/2 AS a,
             (sqrt(1+r)-sqrt(1-r))/2 AS b
           FROM c),
         g AS (
           SELECT a, b,
             (a*r1y - b*r2y)/(a*a - b*b) AS b1,
             (a*r2y - b*r1y)/(a*a - b*b) AS b2
           FROM f)
         SELECT 'l_quantity' AS feature,
           round(a*a*b1*b1 + b*b*b2*b2, 4) AS rel_weight FROM g
         UNION ALL
         SELECT 'l_discount',
           round(b*b*b1*b1 + a*a*b2*b2, 4) FROM g""",
    "q35_frame_sample" ->
      """WITH m AS (
           SELECT doc_id, encode(text) AS content FROM documents),
         f AS (
           SELECT doc_id, content,
                  CAST(octet_length(content) AS BIGINT) AS n,
                  CAST(1 + octet_length(content) % 4 AS BIGINT) AS fcount
           FROM m),
         fr AS (
           SELECT doc_id, content, n, fcount,
                  unnest(range(fcount)) AS frame_idx
           FROM f),
         geo AS (
           SELECT doc_id, content, n, frame_idx,
                  frame_idx * (n // fcount) AS frame_off,
                  least(16, n - frame_idx * (n // fcount)) AS frame_len
           FROM fr)
         SELECT doc_id, frame_idx, frame_off, frame_len,
           CASE WHEN frame_len = 0 THEN 0.0
                ELSE round(list_sum(list_transform(range(frame_len),
                  i -> CAST(('0x' || substr(hex(content),
                    CAST((frame_off+i)*2+1 AS INT), 2)) AS INT)))
                  / (255.0 * frame_len), 4) + 0.0
           END AS frame_brightness
         FROM geo""")
}

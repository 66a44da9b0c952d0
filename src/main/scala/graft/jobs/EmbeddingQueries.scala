package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._
import graft.operators.{Dedup, Similarity}

/** Similarity-search surface over the `embeddings` table (the
  * LLM-data-pipeline extension, SURVEY §7.2 slice 5).
  */
object EmbeddingQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Coordinates for the deterministic sign-bucket LSH (0-based). */
  val lshCoords: Seq[Int] = Seq(0, 16, 32, 48)

  // ---------------------------------------------------------------- q23
  /** Per-vector geometry: dimension + L2 norm (array fold, no shuffle). */
  def q23EmbedNorms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    emb(spark, dir).select(
      $"vec_id",
      size($"embedding").as("dim"),
      round(l2Norm(asDouble($"embedding")), 4).as("l2_norm"),
      $"label")
  }

  // ---------------------------------------------------------------- q24
  /** Brute-force cosine top-5 for queries vec_id < 20 — the exact-ANN
    * baseline: broadcast the query block, stream the corpus once. */
  def q24CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.bruteForceTopK(emb(spark, dir), $"vec_id" < 20, k = 5)
  }

  // ---------------------------------------------------------------- q25
  /** Blocked (label × sign-bucket) nearest neighbor — the scale path:
    * candidate pairs shrink by the block fan-out before any dot product. */
  def q25AnnBlocked(spark: SparkSession, dir: String): DataFrame =
    Similarity.blockedNearest(emb(spark, dir), lshCoords)

  /** Two coordinate tables for the near-dup multi-table LSH (0-based). */
  val nearDupTables: Seq[Seq[Int]] = Seq(Seq(0, 16, 32, 48), Seq(8, 24, 40, 56))

  // ---------------------------------------------------------------- q33
  /** Embedding-cosine near-duplicate pairs (multi-table sign-LSH
    * candidates, exact verification) — the embedding member of the
    * dedup family in [[graft.operators.Dedup]]. */
  def q33EmbedNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(emb(spark, dir), nearDupTables, threshold = 0.4)

  // ================================================================ maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_embed_norms" -> (q23EmbedNorms _),
    "q24_cosine_topk" -> (q24CosineTopk _),
    "q25_ann_blocked" -> (q25AnnBlocked _),
    "q33_embed_neardup" -> (q33EmbedNearDup _))

  val oracle: Map[String, String] = Map(
    "q23_embed_norms" ->
      """SELECT vec_id, len(embedding) AS dim,
         round(sqrt(list_sum(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
         label
         FROM embeddings""",
    "q24_cosine_topk" ->
      """WITH e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
           FROM e),
         sims AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) + 0.0 AS sim
           FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rn
           FROM sims)
         SELECT query_id, neighbor_id, sim, rn
         FROM ranked WHERE rn <= 5""",
    "q25_ann_blocked" ->
      """WITH e AS (
           SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, label, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
             (CASE WHEN v[1] > 0 THEN 8 ELSE 0 END +
              CASE WHEN v[17] > 0 THEN 4 ELSE 0 END +
              CASE WHEN v[33] > 0 THEN 2 ELSE 0 END +
              CASE WHEN v[49] > 0 THEN 1 ELSE 0 END) AS bucket
           FROM e),
         sims AS (
           SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) + 0.0 AS sim
           FROM n a JOIN n b
             ON a.label = b.label AND a.bucket = b.bucket
            AND a.vec_id <> b.vec_id),
         ranked AS (
           SELECT vec_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rn
           FROM sims)
         SELECT vec_id, neighbor_id, sim
         FROM ranked WHERE rn = 1""",
    "q33_embed_neardup" ->
      """WITH e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
             (CASE WHEN v[1] > 0 THEN 8 ELSE 0 END +
              CASE WHEN v[17] > 0 THEN 4 ELSE 0 END +
              CASE WHEN v[33] > 0 THEN 2 ELSE 0 END +
              CASE WHEN v[49] > 0 THEN 1 ELSE 0 END) AS b1,
             (CASE WHEN v[9] > 0 THEN 8 ELSE 0 END +
              CASE WHEN v[25] > 0 THEN 4 ELSE 0 END +
              CASE WHEN v[41] > 0 THEN 2 ELSE 0 END +
              CASE WHEN v[57] > 0 THEN 1 ELSE 0 END) AS b2
           FROM e)
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) + 0.0 AS sim
         FROM n a JOIN n b
           ON a.vec_id < b.vec_id
          AND (a.b1 = b.b1 OR a.b2 = b.b2)
         WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) + 0.0 >= 0.4""")
}

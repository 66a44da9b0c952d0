package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorOps._

/** Similarity search over an `embeddings(vec_id, embedding array<float>,
  * label)` relation.
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * and streams the corpus once — no corpus shuffle, no N×N blow-up. The
  * bucketed path is the 100-TB shape: candidates are restricted to an
  * LSH block, shrinking pair count by the bucket fan-out before any
  * expensive dot product runs.
  */
object Similarity {

  /** Corpus with double vectors + precomputed norms. */
  def prepared(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select($"vec_id", $"label", asDouble($"embedding").as("v"))
      .withColumn("nrm", l2Norm($"v"))
  }

  /** round(sim,4) with -0.0 folded to 0.0 (`+ 0.0` is the IEEE identity
    * that erases the sign of zero in both Spark and DuckDB). Ranking and
    * output both use this value so cross-engine float summation-order
    * differences at the 15th decimal can't flip near-tie neighbors. */
  private def simR(c: Column): Column = round(c, 4) + lit(0.0)

  /** Brute-force cosine top-k: each query (vec_id ∈ querySet) against the
    * whole corpus. Exact baseline for the ANN variants. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = prepared(emb)
    val queries = corpus.filter(queryPred)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"vec_id".asc)
    corpus
      .join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("sim", simR(cosine($"qv", $"v", $"qn", $"nrm")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"sim", $"rn")
  }

  /** Blocked (IVF/LSH-style) nearest neighbor: candidates share the
    * (label, sign-bucket) block; within each block the top-1 neighbor per
    * vector. The deterministic coordinate sign-bucket keeps the operator
    * engine-portable; swap in trained centroids for a production IVF. */
  def blockedNearest(emb: DataFrame, coords: Seq[Int]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = prepared(emb)
      .withColumn("bucket", signBucket($"v", coords))
    val left = corpus.select($"vec_id", $"label", $"bucket", $"v", $"nrm")
    val right = corpus.select($"vec_id".as("cand_id"), $"label".as("cl"),
      $"bucket".as("cb"), $"v".as("cv"), $"nrm".as("cn"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cand_id".asc)
    left
      .join(right,
        $"label" === $"cl" && $"bucket" === $"cb" && $"vec_id" =!= $"cand_id")
      .withColumn("sim", simR(cosine($"v", $"cv", $"nrm", $"cn")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"cand_id".as("neighbor_id"), $"sim")
  }
}

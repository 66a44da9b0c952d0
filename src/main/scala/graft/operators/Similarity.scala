package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
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

  /** Rounded -0.0-normalized sim (see [[VectorOps.roundedSim]]); ranking
    * and output both use this value so cross-engine float
    * summation-order differences can't flip near-tie neighbors. */
  private def simR(c: Column): Column = roundedSim(c)

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

  /** IVF top-k — the trained-centroid scale path (vs [[blockedNearest]]'s
    * fixed sign-buckets): k-means cells partition the corpus, each
    * vector is indexed under its nearest centroid, and queries probe
    * their `probes` nearest cells. Two scale guards:
    *  - cell count is a tuning knob (2¹⁰–2¹⁴ at corpus scale), so cell
    *    population ~N/cells instead of N/2^coords;
    *  - `cellCap` bounds the candidates any one cell can contribute
    *    (members closest to the centroid win), so a hot cell cannot go
    *    quadratic — recall degrades gracefully instead.
    * The centroid table is rows=numCells — always broadcast; the corpus
    * is shuffled once on cell_id. KMeans training itself is Spark ML
    * (sampled corpus pass per iteration, seeded → deterministic). */
  def ivfTopK(emb: DataFrame, numCells: Int, probes: Int, k: Int,
      cellCap: Int = Int.MaxValue, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = prepared(emb).withColumn("fv", array_to_vector($"v"))
    val model = new KMeans().setK(numCells).setSeed(seed)
      .setFeaturesCol("fv").fit(corpus)
    // numCells rows — driver-side by construction, broadcast to executors
    val centroids = broadcast(
      model.clusterCenters.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }
        .toDF("cell", "centroid"))

    // distance of every vector to every centroid (numCells multiplier on
    // a broadcast side only), ranked per vector
    val byDist = Window.partitionBy($"vec_id").orderBy($"d2".asc, $"cell".asc)
    val ranked = corpus.drop("fv")
      .join(centroids)
      .withColumn("d2", aggregate(zip_with($"v", $"centroid",
        (x, c) => (x - c) * (x - c)), lit(0.0), (a, x) => a + x))
      .withColumn("cr", row_number().over(byDist))

    // index side: home cell only, hot cells capped at cellCap members
    // (closest to centroid win — deterministic)
    val byCell = Window.partitionBy($"cell").orderBy($"d2".asc, $"vec_id".asc)
    val indexed = ranked.filter($"cr" === 1)
      .withColumn("cellRank", row_number().over(byCell))
      .filter($"cellRank" <= cellCap)
      .select($"cell", $"vec_id".as("cand_id"), $"v".as("cv"), $"nrm".as("cn"))
    // query side: probe the `probes` nearest cells
    val queries = ranked.filter($"cr" <= probes)
      .select($"cell", $"vec_id", $"v", $"nrm")

    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cand_id".asc)
    queries
      .join(indexed, Seq("cell"))
      .filter($"vec_id" =!= $"cand_id")
      .withColumn("sim", simR(cosine($"v", $"cv", $"nrm", $"cn")))
      // a pair can meet in several probed cells → dedup before ranking
      .select($"vec_id", $"cand_id", $"sim").distinct()
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"vec_id", $"cand_id".as("neighbor_id"), $"sim", $"rn")
  }
}

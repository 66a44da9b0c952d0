package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Codebook-size sweep for the PQ family: reconstruction MSE, fit
  * cost, and two-stage (ADC preselect → exact re-rank) recall@k across
  * a grid of codewords-per-subspace, against ONE shared exact-L2 truth
  * table — the measurement a deployment runs per corpus to site its
  * codebook size before committing an encode (SURVEY §6.2 records the
  * sf0.1 curve this produced; the IvfSweep stance, PQ edition).
  *
  * Usage: `runMain graft.PqSweep [sfDir]`; env `PQ_CODES` overrides
  * the k grid (comma-separated), `PQ_M` the subspace count (default
  * 8), `PQ_FETCH` the re-rank depth (default 100), `PQ_QUERY_STEP=s`
  * samples queries as `vec_id % s == 0` (default 10 — the truth table
  * is the sweep's O(n²) term; recall is estimated on the sample, the
  * candidate/corpus side always full). Prints one JSON line per
  * configuration.
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val m = sys.env.get("PQ_M").map(_.toInt).getOrElse(8)
    val fetch = sys.env.get("PQ_FETCH").map(_.toInt).getOrElse(100)
    val step = sys.env.get("PQ_QUERY_STEP").map(_.toInt).getOrElse(10)
    val kGrid = sys.env.get("PQ_CODES")
      .map(_.split(',').map(_.trim.toInt).toSeq).getOrElse(Seq(16, 64, 256))
    val k = 10

    val emb = Tables.load(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQueries = emb.filter($"vec_id" % step === 0).count()
    val pred = $"vec_id" % step === 0

    val truth = Similarity.bruteForceTopKL2(emb, pred, k)
      .select($"query_id", $"neighbor_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truthRows = truth.count()

    kGrid.foreach { codes =>
      val t0 = System.nanoTime()
      val cs = Similarity.fitPqCodebooks(emb, m = m, k = codes, iters = 10)
      val fitSec = (System.nanoTime() - t0) / 1e9
      val mse = Similarity.pqReconstructionError(emb, cs)
      // serve_sec times ONLY the serve (materialized inside the
      // bracket); the recall grading join against the exact-truth
      // table runs outside it — conflating them overstated serve cost
      // by the truth-join's wall as the corpus grows
      val t1 = System.nanoTime()
      val approx = Similarity.pqTopKRerank(emb, pred, cs, k, fetch)
        .select($"vec_id".as("query_id"), $"neighbor_id")
        .localCheckpoint(true)
      val serveSec = (System.nanoTime() - t1) / 1e9
      val hits = truth.join(approx, Seq("query_id", "neighbor_id")).count()
      org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(approx)
      val recall = hits.toDouble / truthRows
      println(f"""{"pq_m":$m,"pq_codes":$codes,"fetch":$fetch,""" +
        f""""queries":$nQueries,"fit_sec":$fitSec%.2f,"mse":$mse%.4f,""" +
        f""""recall_at_$k":$recall%.4f,"serve_sec":$serveSec%.2f}""")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The 2¹⁴-cell IVF+PQ serving grid — the r18 VERDICT's "re-grid the
  * two-level config with fetch as the third axis" item: at the tracked
  * 16 384-cell posture (200 k × 2000-mode clustered corpus,
  * hierarchical 128×128 fit + polish passes), the float IVF serve's
  * recall is bounded by how many cells a query can AFFORD to probe —
  * the r18 knee sat at recall@10 0.649 (gp=32, probes=8, polish=2).
  * PQ codes cut the per-candidate cost from a dim-length float scan to
  * m table lookups, so the same serve budget probes several× more
  * cells; the fetch-deep exact re-rank then restores precision over
  * the widened candidate set. This sweep measures exactly that trade:
  * recall@10 and serve wall across (probes × fetch) for the CODED
  * artifact serve ([[Similarity.ivfPqTopKFromPostings]] — residual
  * codes, persisted index), with float-postings serves at the old
  * probe depths as the in-run cost anchor.
  *
  * The corpus is L2-NORMALIZED first, so squared-L2 ranking (what PQ
  * quantizes) is order-identical to cosine ranking and every recall
  * grades against ONE cosine truth table — the standard production
  * normalization (cosine is scale-invariant, so the truth is the same
  * relation the raw corpus has).
  *
  * Usage: `runMain graft.PqScaleSweep [corpusSpec]` with corpusSpec
  * `clustered:<n>[:<modes>]` (default `clustered:200000:2000`) or a
  * fixture dir. Env knobs: `PQIVF_CELLS` (16384), `PQIVF_GROUPS`
  * (128), `PQIVF_POLISH` (2), `PQIVF_PROBES` ("8,16,32"),
  * `PQIVF_FETCH` ("100"), `PQIVF_M` (8), `PQIVF_CODES` (256),
  * `PQIVF_QUERY_STEP` (10), `PQIVF_TRAIN_FRACTION` (0.25),
  * `PQIVF_FLOAT_PROBES` ("8,16" — empty string disables the float
  * anchor). One JSON line per configuration.
  */
object PqScaleSweep {
  def main(args: Array[String]): Unit = {
    val spec = args.headOption.getOrElse("clustered:200000:2000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cells = sys.env.get("PQIVF_CELLS").map(_.toInt).getOrElse(16384)
    val groups = sys.env.get("PQIVF_GROUPS").map(_.toInt).getOrElse(128)
    val polish = sys.env.get("PQIVF_POLISH").map(_.toInt).getOrElse(2)
    val probesGrid = sys.env.getOrElse("PQIVF_PROBES", "8,16,32")
      .split(",").map(_.trim.toInt).toSeq
    val fetchGrid = sys.env.getOrElse("PQIVF_FETCH", "100")
      .split(",").map(_.trim.toInt).toSeq
    val m = sys.env.get("PQIVF_M").map(_.toInt).getOrElse(8)
    val codes = sys.env.get("PQIVF_CODES").map(_.toInt).getOrElse(256)
    val step = sys.env.get("PQIVF_QUERY_STEP").map(_.toInt).getOrElse(10)
    val trainFraction =
      sys.env.get("PQIVF_TRAIN_FRACTION").map(_.toDouble).getOrElse(0.25)
    val floatProbes = sys.env.getOrElse("PQIVF_FLOAT_PROBES", "8,16")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val k = 10

    val raw =
      if (spec.startsWith("clustered:")) {
        val p = spec.stripPrefix("clustered:").split(":")
        ScaleData.clusteredEmbeddings(spark, p(0).toLong,
          clusters = p.lift(1).map(_.toInt).getOrElse(2000))
      } else Tables.load(spark, spec, "embeddings")
    // normalize: L2 ranking over these vectors == cosine ranking
    val emb = raw
      .withColumn("nrm0", sqrt(aggregate(
        transform($"embedding", x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, x) => a + x)))
      .filter($"nrm0" > 0)
      .select($"vec_id",
        transform($"embedding", x => (x.cast("double") / $"nrm0")
          .cast("float")).as("embedding"),
        $"label")
      .repartition(spark.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val pred = $"vec_id" % step === 0
    val queries = emb.filter(pred)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQueries = queries.count()
    val truth = Similarity.bruteForceTopK(emb, pred, k)
      .select($"query_id", $"neighbor_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    truth.count()
    System.err.println(s"[pqscale] corpus n=$n queries=$nQueries truth ready")

    // tracked fit: hierarchical (the only affordable route at 2^14
    // cells) + polish — the r18 knee's configuration
    val tFit0 = System.nanoTime()
    val base = Similarity.fitIvfHierarchical(emb, groups,
      math.max(1, cells / groups), trainFraction = trainFraction)
    val gcs =
      if (polish > 0)
        Similarity.polishIvfGrouped(emb, base, polish,
          trainFraction = trainFraction)
      else base
    val fitSec = (System.nanoTime() - tFit0) / 1e9
    val cents = gcs.flat.cents
    System.err.println(f"[pqscale] fit ${cents.length} cells in $fitSec%.1f s")

    // residual codebooks + the persisted coded artifact, built once
    val tPq0 = System.nanoTime()
    val cs = Similarity.fitPqCodebooksResidual(emb, cents, m, codes,
      iters = 10)
    val pqFitSec = (System.nanoTime() - tPq0) / 1e9
    val baseDir = java.nio.file.Files.createTempDirectory("graft_pqscale")
    val codedPath = baseDir.resolve("coded").toString
    val tBuild0 = System.nanoTime()
    Similarity.saveIvfPqPostings(
      Similarity.ivfPqPostings(emb, cents, cs), codedPath, cs)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9
    System.err.println(
      f"[pqscale] pq fit $pqFitSec%.1f s, coded artifact $buildSec%.1f s")

    def graded(served: org.apache.spark.sql.DataFrame,
        queryCol: String): (Double, Double) = {
      val t0 = System.nanoTime()
      servedForTiming(served).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val approx = served.select(col(queryCol).as("query_id"),
        $"neighbor_id")
      val hits = truth.join(approx, Seq("query_id", "neighbor_id")).count()
      (hits.toDouble / (nQueries * k), sec)
    }
    def servedForTiming(df: org.apache.spark.sql.DataFrame) = df

    // float-postings anchor: the old serve shape at the old probe
    // depths, same fit, same artifact machinery (kernel-built float
    // postings, pruned serve)
    if (floatProbes.nonEmpty) {
      val floatPath = baseDir.resolve("float").toString
      val tF0 = System.nanoTime()
      Similarity.saveIvfPostings(
        Similarity.ivfPostingsFromGrouped(emb, gcs), floatPath)
      val floatBuildSec = (System.nanoTime() - tF0) / 1e9
      val postings = Similarity.readPostings(spark, floatPath)
      floatProbes.foreach { p =>
        val (recall, sec) = graded(
          Similarity.ivfTopKFromPostingsPruned(queries, cents, postings,
            p, k), "vec_id")
        println(f"""{"route":"float","cells":${cents.length},"probes":$p,""" +
          f""""recall_at_$k":$recall%.4f,"serve_sec":$sec%.2f,""" +
          f""""fit_sec":$fitSec%.1f,"build_sec":$floatBuildSec%.1f,""" +
          f""""polish":$polish,"queries":$nQueries}""")
      }
    }

    // the coded grid: probes × fetch — what PQ's cheap candidates buy
    for (p <- probesGrid; f <- fetchGrid) {
      val (recall, sec) = graded(
        Similarity.ivfPqTopKFromPostings(queries, emb, cents, codedPath,
          p, k, f), "vec_id")
      println(f"""{"route":"ivfpq","cells":${cents.length},"probes":$p,""" +
        f""""fetch":$f,"pq_m":$m,"pq_codes":$codes,""" +
        f""""recall_at_$k":$recall%.4f,"serve_sec":$sec%.2f,""" +
        f""""fit_sec":$fitSec%.1f,"pq_fit_sec":$pqFitSec%.1f,""" +
        f""""build_sec":$buildSec%.1f,"polish":$polish,""" +
        f""""queries":$nQueries}""")
    }
    spark.stop()
  }
}

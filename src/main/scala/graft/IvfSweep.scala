package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Index-tuning sweep for the trained-IVF ANN path: recall@k AND
  * serving latency across a (cells × probes) grid, against one shared
  * brute-force truth table — the measurement an index operator runs
  * per corpus build to site the recall/latency knee before committing
  * defaults (SURVEY §6.2 records the sf0.1 curve this produced).
  *
  * Usage: `runMain graft.IvfSweep [sfDir]`; env `IVF_CELLS` /
  * `IVF_PROBES` override the grid (comma-separated). Prints one JSON
  * line per configuration.
  *
  * `sfDir` may instead be `clustered:<n>[:<clusters>[:<spread>]]` —
  * the corpus is then [[ScaleData.clusteredEmbeddings]] generated
  * in-memory (deterministic, no disk), the mixture-of-clusters shape
  * real embedding corpora have. The dir-based default measures the
  * fixtures' near-uniform corpus (the lower-bound regime); the
  * clustered mode is where the knee is meaningful (SURVEY §6.2).
  *
  * Large-N knobs (the §6.2 production-cardinality grid):
  *  - `IVF_ROUTE=large` serves through [[Similarity.ivfTopKLarge]]
  *    (kernel assignment, no N×cells expansion) — REQUIRED above a few
  *    hundred cells, where the window-ranked route's shuffle explodes;
  *  - `IVF_ROUTE=2l` serves through [[Similarity.ivfTopKTwoLevel]]
  *    (grouped assignment: `IVF_GROUPS` groups, default ≈√cells,
  *    `IVF_GROUP_PROBES` probed, default 4) — the 2¹⁴⁺-cells shape
  *    whose assignment term stays sublinear in cells;
  *  - `IVF_ROUTE=2lh` FITS hierarchically too
  *    ([[Similarity.fitIvfHierarchical]]: one k=groups coarse fit +
  *    distributed per-group sub-fits of cells/groups each) and serves
  *    through the same two-level kernel — the fit-cost remedy where
  *    flat k-means at 2¹⁴ cells is itself the bottleneck;
  *  - `IVF_QUERY_STEP=s` computes the truth table (the sweep's O(n²)
  *    term) over the deterministic query sample `vec_id % s == 0`
  *    instead of every vector; recall@k is then estimated on the
  *    sample (serving still runs EVERY query — the timed number stays
  *    the full production load);
  *  - `IVF_TRAIN_FRACTION` overrides the k-means sample (default 0.25).
  */
object IvfSweep {
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

    def corpus(): org.apache.spark.sql.DataFrame =
      if (sfDir.startsWith("clustered:")) {
        val p = sfDir.stripPrefix("clustered:").split(":")
        ScaleData.clusteredEmbeddings(spark, p(0).toLong,
          clusters = p.lift(1).map(_.toInt).getOrElse(100),
          spread = p.lift(2).map(_.toDouble).getOrElse(0.35))
      } else {
        // encoding-drift gate before any timing (scoped: this sweep
        // reads only the embeddings table, and its input dir may hold
        // just that)
        Tables.validate(spark, sfDir, Seq("embeddings"))
        Tables.load(spark, sfDir, "embeddings")
      }

    val k = 10
    val cellsGrid = sys.env.getOrElse("IVF_CELLS", "16,32,64")
      .split(",").map(_.trim.toInt).toSeq
    val probesGrid = sys.env.getOrElse("IVF_PROBES", "4,8,12,16")
      .split(",").map(_.trim.toInt).toSeq
    val route = sys.env.getOrElse("IVF_ROUTE", "exact")
    require(Seq("exact", "large", "2l", "2lh").contains(route),
      s"IVF_ROUTE=$route")
    // two-level quantizer shape (route=2l): group count and probed groups
    val numGroups = sys.env.get("IVF_GROUPS").map(_.toInt)
    val groupProbes = sys.env.get("IVF_GROUP_PROBES").map(_.toInt).getOrElse(4)
    val queryStep = sys.env.get("IVF_QUERY_STEP").map(_.toLong)
    val trainFraction =
      sys.env.get("IVF_TRAIN_FRACTION").map(_.toDouble).getOrElse(0.25)

    // single-file corpora scan as 1–2 splits, and every kernel
    // assignment pass downstream runs at the cached partition count —
    // cache a cluster-parallel layout (same fix as PostingsSweep r14)
    val emb = corpus()
      .repartition(spark.sparkContext.defaultParallelism).cache()
    val n = emb.count()
    // ONE truth table for the whole grid (the sweep's dominant cost) —
    // over the query sample when IVF_QUERY_STEP bounds the n² term
    val queryPred = queryStep
      .map(s => pmod($"vec_id", lit(s)) === 0).getOrElse(lit(true))
    val nQueries = queryStep.map(_ => emb.filter(queryPred).count()).getOrElse(n)
    val truth = Similarity.bruteForceTopK(emb, queryPred, k)
      .select($"query_id", $"neighbor_id").cache()
    truth.count()

    // the model depends only on cells (fit is seeded-deterministic), so
    // fit once per cells value rather than once per grid point
    for (cells <- cellsGrid) {
      val groups = numGroups.getOrElse(math.max(1, math.sqrt(cells).round.toInt))
      val tFit0 = System.nanoTime()
      // `2lh` fits the two-level index HIERARCHICALLY (group fit +
      // distributed per-group sub-fits — §6.2's fit-cost remedy at
      // 2¹⁴ cells); every other route flat-fits `cells` centroids
      // IVF_POLISH=n (route=2lh only): n distributed Lloyd passes over
      // the full cell set after the hierarchical fit — the recall-
      // recovery knob, timed INSIDE fit_sec so the grid shows the
      // fit-cost/recall trade as one curve
      val polishIters = sys.env.get("IVF_POLISH").map(_.toInt).getOrElse(0)
      val fitted: Either[org.apache.spark.ml.clustering.KMeansModel,
          graft.expressions.IvfGroupedCentroidSet] =
        if (route == "2lh") {
          val base = Similarity.fitIvfHierarchical(emb, groups,
            math.max(1, cells / groups), trainFraction = trainFraction)
          Right(if (polishIters > 0)
            Similarity.polishIvfGrouped(emb, base, polishIters,
              trainFraction = trainFraction)
          else base)
        } else
          Left(Similarity.fitIvfIndex(emb, cells, trainFraction = trainFraction))
      val fitSec = (System.nanoTime() - tFit0) / 1e9
      val actualCells = fitted.fold(_.clusterCenters.length, _.flat.numCells)
      for (probes <- probesGrid if probes <= actualCells) {
        def serve() = (route, fitted) match {
          case ("large", Left(model)) =>
            Similarity.ivfTopKLarge(emb, model, probes, k)
          case ("2l", Left(model)) =>
            Similarity.ivfTopKTwoLevel(emb, model, probes, k, groups,
              groupProbes)
          case ("2lh", Right(gcs)) =>
            Similarity.ivfTopKWithGrouped(emb, gcs, probes, k, groupProbes)
          case (_, Left(model)) =>
            Similarity.ivfTopKWithModel(emb, model, probes, k)
          case other => sys.error(s"unreachable route/fit pairing: $other")
        }
        serve().write.format("noop").mode("overwrite").save() // warm-up
        val t0 = System.nanoTime()
        serve().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val approx = serve().filter(queryPred)
          .select($"vec_id".as("query_id"), $"neighbor_id")
        val hits = truth.join(approx, Seq("query_id", "neighbor_id")).count()
        val recall = hits.toDouble / (nQueries * k)
        val routeJson =
          if (route == "2l" || route == "2lh")
            s""""route":"$route","groups":$groups,"group_probes":$groupProbes,"actual_cells":$actualCells""" +
              (if (route == "2lh") s""","polish":$polishIters""" else "")
          else s""""route":"$route""""
        println(f"""{"cells":$cells,"probes":$probes,"recall_at_$k%d":$recall%.4f,"serve_sec":$sec%.3f,"fit_sec":$fitSec%.1f,$routeJson,"queries":$nQueries}""")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** STEADY-STATE serving sweep: a bounded QUERY SET served against a
  * persisted cell-partitioned postings artifact (the deployment shape —
  * the corpus is indexed once, queries arrive forever), comparing the
  * three query-side assignment routes at the same index:
  *
  *  - `expanded`  [[Similarity.ivfTopKFromPostingsWithCentroids]] —
  *    queries×cells join + `row_number` (the oracle-exact shape; its
  *    assignment term materializes q×cells rows);
  *  - `large`     [[Similarity.ivfTopKFromPostingsLarge]]-shape via the
  *    flat kernel — one O(cells×dim) scan per query, no expansion;
  *  - `2l`        [[Similarity.ivfTopKFromPostingsGrouped]] — two-level
  *    kernel, O(groups + probed members) per query;
  *  - `pruned`    [[Similarity.ivfTopKFromPostingsPruned]] — flat
  *    kernel assignment + the probed-cell set pushed as a partition
  *    filter, so the artifact read itself shrinks to probed
  *    directories (measure with a LARGE `PS_QUERY_STEP`: pruning bites
  *    when the probe set covers few cells).
  *
  * All three serve the SAME artifact and the exact routes must agree on
  * recall (asserted); `2l` trades recall by the group prune. The
  * candidate-join term is identical across routes (same probe sets for
  * the exact pair), so the wall-clock spread isolates the per-query
  * ASSIGNMENT arithmetic — the term that grows with cell count and the
  * reason the kernel routes exist (SURVEY §6.2).
  *
  * Usage: `runMain graft.PostingsSweep [corpus]` where corpus is an
  * sfDir or `clustered:<n>[:<clusters>[:<spread>]]` (IvfSweep's
  * contract). Env: `PS_CELLS` grid (default "4096"), `PS_GROUPS`
  * (default ≈√cells), `PS_GROUP_PROBES` (default groups/2), `PS_PROBES`
  * (default 8), `PS_QUERY_STEP` (default 100 — queries are
  * `vec_id % step == 0`), `PS_TRAIN_FRACTION` (default 0.25),
  * `PS_ROUTES` (default "expanded,large,2l"). The index is fitted
  * hierarchically ([[Similarity.fitIvfHierarchical]] — the §6.2
  * fit-cost remedy), so the sweep is usable at 2¹⁴ cells where a flat
  * fit alone takes ~10 min. */
object PostingsSweep {
  def main(args: Array[String]): Unit = {
    val corpusSpec = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // cache a WELL-PARTITIONED corpus: scaledata tables are single
    // parquet files, so the raw scan yields 1–2 splits and every
    // downstream kernel scan (per-row O(cells×dim) assignment — the
    // build's dominating term at 2¹⁴ cells) would run 2-wide on a
    // 32-core box; a real deployment's corpus arrives in thousands of
    // splits, which this one exchange reproduces
    val emb =
      (if (corpusSpec.startsWith("clustered:")) {
        val p = corpusSpec.stripPrefix("clustered:").split(":")
        ScaleData.clusteredEmbeddings(spark, p(0).toLong,
          clusters = p.lift(1).map(_.toInt).getOrElse(100),
          spread = p.lift(2).map(_.toDouble).getOrElse(0.35))
      } else {
        Tables.validate(spark, corpusSpec, Seq("embeddings"))
        Tables.load(spark, corpusSpec, "embeddings")
      }).repartition(spark.sparkContext.defaultParallelism).cache()
    emb.count()

    val k = 10
    val cellsGrid = sys.env.getOrElse("PS_CELLS", "4096")
      .split(",").map(_.trim.toInt).toSeq
    val probes = sys.env.get("PS_PROBES").map(_.toInt).getOrElse(8)
    val step = sys.env.get("PS_QUERY_STEP").map(_.toLong).getOrElse(100L)
    val trainFraction =
      sys.env.get("PS_TRAIN_FRACTION").map(_.toDouble).getOrElse(0.25)
    val routes = sys.env.getOrElse("PS_ROUTES", "expanded,large,2l")
      .split(",").map(_.trim).toSeq
    val known = Set("expanded", "large", "2l", "pruned")
    require(routes.forall(known), s"unknown route in PS_ROUTES=$routes")

    val queryPred = pmod($"vec_id", lit(step)) === 0
    val queries = emb.filter(queryPred).cache()
    val nQueries = queries.count()
    val truth = Similarity.bruteForceTopK(emb, queryPred, k)
      .select($"query_id", $"neighbor_id").cache()
    truth.count()

    for (cells <- cellsGrid) {
      val groups = sys.env.get("PS_GROUPS").map(_.toInt)
        .getOrElse(math.max(1, math.sqrt(cells).round.toInt))
      val groupProbes = sys.env.get("PS_GROUP_PROBES").map(_.toInt)
        .getOrElse(math.max(1, groups / 2))
      val tFit0 = System.nanoTime()
      val gcs = Similarity.fitIvfHierarchical(emb, groups,
        math.max(1, cells / groups), trainFraction = trainFraction)
      val fitSec = (System.nanoTime() - tFit0) / 1e9
      // ONE artifact per cells value, persisted cell-partitioned and
      // re-read — serving measures the deployment read path, including
      // the probe-pruned directory scan
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ps_$cells").resolve("postings")
        .toString
      val tBuild0 = System.nanoTime()
      Similarity.saveIvfPostings(
        Similarity.ivfPostingsFromGrouped(emb, gcs), dir)
      val buildSec = (System.nanoTime() - tBuild0) / 1e9
      val postings = Similarity.readPostings(spark, dir)
      // PS_PACKED=<cellsPerPack>: in-run A/B of the cell-group layout —
      // same postings frame, one file per pack instead of one per cell.
      // Build wall + packed-pruned serve wall + recall (must equal the
      // exact routes) ride their own JSON line.
      sys.env.get("PS_PACKED").map(_.toInt).foreach { cpp =>
        val pdir = java.nio.file.Files
          .createTempDirectory(s"graft_psp_$cells").resolve("packed")
          .toString
        val tP0 = System.nanoTime()
        Similarity.saveIvfPostingsPacked(
          Similarity.ivfPostingsFromGrouped(emb, gcs), pdir, cpp)
        val packedBuildSec = (System.nanoTime() - tP0) / 1e9
        def servePacked() = Similarity.ivfTopKFromPostingsPackedPruned(
          queries, gcs.flat.cents, pdir, probes, k)
        servePacked().write.format("noop").mode("overwrite").save() // warm
        val tS0 = System.nanoTime()
        servePacked().write.format("noop").mode("overwrite").save()
        val packedServeSec = (System.nanoTime() - tS0) / 1e9
        val approx = servePacked()
          .select($"vec_id".as("query_id"), $"neighbor_id")
        val hits = truth.join(approx, Seq("query_id", "neighbor_id")).count()
        val recall = hits.toDouble / (nQueries * k)
        println(f"""{"route":"packed","cells":${gcs.flat.numCells},"cells_per_pack":$cpp,"probes":$probes,"queries":$nQueries,"recall_at_$k%d":$recall%.4f,"serve_sec":$packedServeSec%.3f,"build_sec":$packedBuildSec%.1f,"classic_build_sec":$buildSec%.1f}""")
      }
      def serve(route: String) = route match {
        case "expanded" => Similarity.ivfTopKFromPostingsWithCentroids(
          queries, gcs.flat.cents, postings, probes, k)
        case "large" => Similarity.ivfTopKFromPostingsLargeWithCentroids(
          queries, gcs.flat.cents, postings, probes, k)
        case "2l" => Similarity.ivfTopKFromPostingsGrouped(
          queries, gcs, postings, probes, k, groupProbes)
        case "pruned" => Similarity.ivfTopKFromPostingsPruned(
          queries, gcs.flat.cents, postings, probes, k)
      }
      val recallByRoute = routes.map { route =>
        serve(route).write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        serve(route).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val approx = serve(route)
          .select($"vec_id".as("query_id"), $"neighbor_id")
        val hits = truth.join(approx, Seq("query_id", "neighbor_id")).count()
        val recall = hits.toDouble / (nQueries * k)
        println(f"""{"route":"$route","cells":${gcs.flat.numCells},"groups":$groups,"group_probes":$groupProbes,"probes":$probes,"queries":$nQueries,"recall_at_$k%d":$recall%.4f,"serve_sec":$sec%.3f,"fit_sec":$fitSec%.1f,"build_sec":$buildSec%.1f}""")
        route -> recall
      }.toMap
      // the exact-assignment routes must agree bit-for-bit
      val exact = recallByRoute.view
        .filterKeys(Set("expanded", "large", "pruned")).toMap
      require(exact.values.toSet.size <= 1,
        s"exact routes disagree: $exact")
    }
    spark.stop()
  }
}

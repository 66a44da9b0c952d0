package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileUtil, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.sources.WarehouseWriter
import graft.streaming.CorpusIngest

/** Demonstrates that `compactParquet` RESTORES the streaming near-dup
  * seam's per-trigger flatness (SURVEY §6.1.6): the band index accrues
  * one delta file per micro-batch, and §6.1.6 measured the resulting
  * drift (sf1 flatness 1.34) but only NAMED compaction as the remedy —
  * this harness lands the number.
  *
  * Protocol — a controlled A/B on identical mid-run state:
  *  1. phase A: seed the band index from slice 0, stream `nBatches`
  *     micro-batches through [[CorpusIngest.parquetDedupIngest]]
  *     (one parquet file per trigger, `Trigger.AvailableNow`);
  *  2. snapshot the index + corpus directories BYTE-FOR-BYTE (a
  *     re-write would fold the fragmentation that is the experiment's
  *     subject — `FileUtil.copy` preserves the file layout exactly);
  *  3. control leg: stream `nBatches` more batches against the
  *     UNCOMPACTED snapshot;
  *  4. treatment leg: `compactParquet` the original index (the
  *     artifact every batch screens against), then stream the SAME
  *     batches against it;
  *  5. report per-batch times for all three segments, the B-leg
  *     means/flatness, and require the two legs' kept corpora
  *     digest-equal — compaction must change layout, never results.
  *
  * Usage: `tools/run_main.sh graft.CompactBench [sfDir] [nBatches]`
  * (nBatches per segment; the corpus must hold 2*nBatches+1 slices).
  */
object CompactBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scaledata/sf1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    require(nBatches >= 2, s"nBatches=$nBatches — need >= 2 per segment")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.streaming.numRecentProgressUpdates",
        math.max(100, nBatches + 8).toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Tables.validate(spark, sfDir, Seq("documents"))

    val docs = Tables.load(spark, sfDir, "documents").select($"doc_id", $"text")
    val n = docs.count()
    val nSlices = 2 * nBatches + 1
    val sz = (n + nSlices - 1) / nSlices
    def slice(i: Int): DataFrame =
      docs.filter($"doc_id" >= i * sz && $"doc_id" < (i + 1) * sz)

    def stageFiles(from: Int, until: Int): String = {
      val staging = Files.createTempDirectory("graft_compactbench_stage").toString
      (from until until).foreach { i =>
        slice(i).coalesce(1).write.mode("append").parquet(staging)
        Thread.sleep(1100) // distinct mtimes -> deterministic file order
      }
      staging
    }
    def streamInto(staging: String, idx: String, corpus: String)
        : Seq[(Long, Double)] = {
      val src = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
      val q = CorpusIngest.parquetDedupIngest(src, idx, corpus, threshold = 0.6)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.toSeq.filter(_.numInputRows > 0).map(p =>
        (p.numInputRows, p.durationMs.get("triggerExecution").toDouble / 1000.0))
    }
    def report(seg: String, prog: Seq[(Long, Double)]): Unit =
      prog.zipWithIndex.foreach { case ((rows, sec), i) =>
        println(f"""{"segment":"$seg","batch":$i,"rows":$rows,"sec":$sec%.2f}""")
      }
    // steady-state = warm-up batch excluded, as IngestBench defines it
    def steady(prog: Seq[(Long, Double)]): Seq[Double] =
      prog.map(_._2).drop(1)
    def mean(xs: Seq[Double]): Double = xs.sum / xs.size

    // ---- phase A: accrue nBatches of one-file-per-trigger deltas
    val idx = Files.createTempDirectory("graft_compactbench_idx").toString
    val corpus = Files.createTempDirectory("graft_compactbench_corp").toString
    Dedup.minhashBandIndex(slice(0), k = 5, numHashes = 32, bands = 8,
      hashedShingles = true).write.mode("overwrite").parquet(idx)
    val stagingA = stageFiles(1, nBatches + 1)
    val a = streamInto(stagingA, idx, corpus)
    report("A_accrue", a)

    // ---- byte-for-byte snapshot of the mid-run artifacts
    val fs = new HPath(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    def snapshot(src: String): String = {
      val dst = Files.createTempDirectory("graft_compactbench_snap").toString
      fs.delete(new HPath(dst), true) // copy wants to create it
      require(FileUtil.copy(fs, new HPath(src), fs, new HPath(dst), false, conf),
        s"snapshot copy failed: $src")
      dst
    }
    val idxCtl = snapshot(idx)
    val corpusCtl = snapshot(corpus)
    def fileCount(path: String): Int =
      fs.listStatus(new HPath(path))
        .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val idxFilesPre = fileCount(idx)

    val stagingB = stageFiles(nBatches + 1, nSlices)

    // ---- control: same batches against the uncompacted snapshot
    val ctl = streamInto(stagingB, idxCtl, corpusCtl)
    report("B_nocompact", ctl)

    // ---- treatment: compact the index, then the same batches
    val (fBefore, fAfter, idxBytes) =
      WarehouseWriter.compactParquet(spark, idx, targetFileBytes = 128L << 20)
    val cmp = streamInto(stagingB, idx, corpus)
    report("B_compact", cmp)

    val keptCtl = ScaleSweep.digest(spark.read.parquet(corpusCtl))
    val keptCmp = ScaleSweep.digest(spark.read.parquet(corpus))
    val aSteady = steady(a)
    println(f"""{"metric":"compact_bench","sf_dir":"$sfDir","docs":$n,""" +
      f""""batches_per_segment":$nBatches,""" +
      f""""idx_files_precompact":$idxFilesPre,""" +
      f""""idx_files_postcompact":$fAfter,"idx_bytes":$idxBytes,""" +
      f""""a_flatness":${aSteady.max / aSteady.min}%.2f,""" +
      f""""a_tail_sec":${a.last._2}%.2f,""" +
      f""""b_nocompact_mean_sec":${mean(steady(ctl))}%.2f,""" +
      f""""b_nocompact_flatness":${steady(ctl).max / steady(ctl).min}%.2f,""" +
      f""""b_compact_mean_sec":${mean(steady(cmp))}%.2f,""" +
      f""""b_compact_flatness":${steady(cmp).max / steady(cmp).min}%.2f,""" +
      f""""restore_speedup":${mean(steady(ctl)) / mean(steady(cmp))}%.2f,""" +
      f""""kept_equal":${keptCtl == keptCmp}}""")
    require(keptCtl == keptCmp,
      s"compaction changed the kept corpus: control=$keptCtl compacted=$keptCmp")
    require(fBefore == idxFilesPre && fAfter < fBefore,
      s"compaction did not fold files: $fBefore -> $fAfter")
    spark.stop()
  }
}

/** The POSTINGS maintenance A/B (r14): per-append cost and steady-state
  * serve cost of the two IVF postings maintenance modes —
  *
  *  - RECAP ([[graft.operators.Similarity.appendIvfPostingsInPlace]]):
  *    every touched cell's full population is re-ranked and its
  *    directory replaced (1-file-per-cell self-maintains; serving is
  *    always the compact shape) — per-append cost ∝ touched
  *    populations;
  *  - FRAGMENT ([[graft.operators.Similarity.appendIvfPostingsFragment]]
  *    then [[graft.operators.Similarity.compactIvfPostings]]): per
  *    append only the batch's own rows are written — O(batch) — at the
  *    price of one file per touched cell per append, paid back as a
  *    growing full-scan serve wall until compaction folds it.
  *
  * The artifact is built UNCAPPED so the two modes hold row-identical
  * artifacts at every step (asserted by digest) and the measured spread
  * is pure maintenance economics: append wall per mode, file counts,
  * serve wall fragmented vs compacted, compaction cost.
  *
  * Usage: `tools/run_main.sh graft.PostingsCompactBench [corpus]
  * [nAppends]` — corpus is an sfDir or `clustered:<n>[:k[:spread]]`;
  * env `PCB_GROUPS` / `PCB_CELLS_PER_GROUP` size the hierarchical fit
  * (default 64 × 64 = 4096 cells), `PCB_QUERY_STEP` the serve query
  * set (default 100). `PCB_GP` switches BOTH legs to the two-level
  * assignment law: the artifact is `ivfPostingsTwoLevel`-built at that
  * groupProbes, leg R appends with the grouped recap and leg F with
  * the grouped fragment route — the 2¹⁴⁺-cells maintenance posture,
  * where per-row assignment is O(groups + probed members) instead of
  * O(cells) (digest comparability across states is preserved because
  * every leg runs the SAME law). */
object PostingsCompactBench {
  def main(args: Array[String]): Unit = {
    import graft.operators.Similarity
    val corpusSpec = args.headOption.getOrElse("scaledata/sf1")
    val nAppends = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb =
      (if (corpusSpec.startsWith("clustered:")) {
        val p = corpusSpec.stripPrefix("clustered:").split(":")
        ScaleData.clusteredEmbeddings(spark, p(0).toLong,
          clusters = p.lift(1).map(_.toInt).getOrElse(100),
          spread = p.lift(2).map(_.toDouble).getOrElse(0.35))
      } else {
        Tables.validate(spark, corpusSpec, Seq("embeddings"))
        Tables.load(spark, corpusSpec, "embeddings")
      }).cache()
    val n = emb.count()
    val groups = sys.env.get("PCB_GROUPS").map(_.toInt).getOrElse(64)
    val cpg = sys.env.get("PCB_CELLS_PER_GROUP").map(_.toInt).getOrElse(64)
    val step = sys.env.get("PCB_QUERY_STEP").map(_.toLong).getOrElse(100L)

    // seed = first half; appends slice the second half evenly
    val seedPred = $"vec_id" < n / 2
    val slices = (0 until nAppends).map { i =>
      emb.filter(!seedPred &&
        org.apache.spark.sql.functions.pmod($"vec_id", lit(nAppends)) === i)
    }
    val gcs = Similarity.fitIvfHierarchical(emb.filter(seedPred), groups, cpg,
      trainFraction = if (n < 50000) 1.0 else 0.25)
    val cents = gcs.flat.cents
    println(s"""{"phase":"fit","cells":${gcs.flat.numCells},"groups":$groups}""")

    val fs = new HPath("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    // PCB_GP: run the whole A/B under the two-level assignment law at
    // that groupProbes (build, recap leg, fragment leg) — the 2¹⁴⁺-cells
    // posture where assignment itself must be O(groups + probed members)
    val gpEnv = sys.env.get("PCB_GP").map(_.toInt)
    def newArtifact(): String = {
      val dir = Files.createTempDirectory("graft_pcb").resolve("postings").toString
      Similarity.saveIvfPostings(gpEnv match {
        case Some(gp) =>
          Similarity.ivfPostingsTwoLevel(emb.filter(seedPred), gcs, gp)
        case None =>
          Similarity.ivfPostingsFromGrouped(emb.filter(seedPred), gcs)
      }, dir)
      dir
    }
    def fileCount(dir: String): Int =
      fs.listStatus(new HPath(dir))
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("cell="))
        .map(d => fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.startsWith("part-"))).sum
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def serveSec(dir: String): (Double, ScaleSweep.Digest) = {
      val postings = Similarity.readPostings(spark, dir)
      val queries = emb.filter(pmod($"vec_id", lit(step)) === 0)
      def go() = Similarity.ivfTopKFromPostingsLargeWithCentroids(
        queries, cents, postings, probes = 8, k = 10)
      go().write.format("noop").mode("overwrite").save() // warm
      val (_, sec) = timed(go().write.format("noop").mode("overwrite").save())
      (sec, ScaleSweep.digest(go()))
    }

    // ---- leg R: recap appends (in-place grouped; without PCB_GP at
    // degenerate gp — bit-equal to the exact recap; the artifact stays
    // 1-file-per-cell either way)
    val dirR = newArtifact()
    val recapSecs = slices.map { b =>
      timed(Similarity.appendIvfPostingsInPlaceGrouped(spark, dirR, gcs, b,
        groupProbes = gpEnv.getOrElse(gcs.numGroups)))._2
    }
    val filesR = fileCount(dirR)
    val (serveRSec, digR) = serveSec(dirR)

    // ---- leg F: fragment appends, then compaction
    val dirF = newArtifact()
    val fragSecs = slices.map { b =>
      timed(gpEnv match {
        case Some(_) =>
          Similarity.appendIvfPostingsFragmentGrouped(spark, dirF, gcs, b)
        case None =>
          Similarity.appendIvfPostingsFragment(spark, dirF, cents, b)
      })._2
    }
    val filesFrag = fileCount(dirF)
    val (serveFragSec, digFrag) = serveSec(dirF)
    val ((nFolded, fBefore, fAfter), compactSec) =
      timed(Similarity.compactIvfPostings(spark, dirF))
    val (serveCmpSec, digCmp) = serveSec(dirF)

    // ---- leg RR: RETAINED recap appends — the same recap semantics
    // under the tombstone contract (new files + manifest retire +
    // prior-epoch vacuum instead of dynamic partition overwrite).
    // The spread vs leg R is the measured PRICE OF SNAPSHOT SAFETY:
    // staging renames + tombstone bookkeeping per append, and the
    // one-epoch storage overhang (filesRR - cells retired files).
    val dirRR = newArtifact()
    val retainedSecs = slices.map { b =>
      timed(gpEnv match {
        case Some(_) =>
          Similarity.appendIvfPostingsRetainedGrouped(spark, dirRR, gcs, b)
        case None =>
          Similarity.appendIvfPostingsRetained(spark, dirRR, gcs.flat.cents, b)
      })._2
    }
    val filesRR = fileCount(dirRR) // live + one epoch of tombstones
    val (serveRRSec, digRR) = serveSec(dirRR)

    // ---- leg A: the AUTO ROUTER (appendIvfPostingsAuto) — every
    // append routed by the measured regime law (touched populations /
    // batch); records which way each append flipped at this posture
    val dirA = newArtifact()
    val autoRoutes = slices.map { b =>
      val (route, sec) = timed(gpEnv match {
        case Some(_) =>
          Similarity.appendIvfPostingsAutoGrouped(spark, dirA, gcs, b)
        case None =>
          Similarity.appendIvfPostingsAuto(spark, dirA, gcs.flat.cents, b)
      })
      (route, sec)
    }
    val autoSecs = autoRoutes.map(_._2)
    val routesTaken = autoRoutes.map(_._1.route)
    Similarity.compactIvfPostings(spark, dirA) // no-op if it recapped all
    val (_, digAuto) = serveSec(dirA)

    // uncapped + disjoint batches: all four artifact states serve the
    // identical result — the spread is pure layout economics
    require(digR == digFrag && digFrag == digCmp && digCmp == digAuto &&
      digAuto == digRR,
      s"serve results drifted across maintenance modes: " +
        s"$digR / $digFrag / $digCmp / $digAuto / $digRR")
    def arr(xs: Seq[Double]) =
      xs.map(s => f"$s%.2f").mkString("[", ",", "]")
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    println(f"""{"metric":"postings_compact_bench","corpus":"$corpusSpec","vectors":$n,""" +
      f""""cells":${gcs.flat.numCells},"appends":$nAppends,""" +
      f""""gp":${gpEnv.map(_.toString).getOrElse("null")},""" +
      f""""recap_append_secs":${arr(recapSecs)},"frag_append_secs":${arr(fragSecs)},""" +
      f""""retained_append_secs":${arr(retainedSecs)},""" +
      f""""retained_overhead":${mean(retainedSecs) / mean(recapSecs)}%.2f,""" +
      f""""files_retained":$filesRR,"serve_retained_sec":$serveRRSec%.2f,""" +
      f""""append_speedup":${mean(recapSecs) / mean(fragSecs)}%.2f,""" +
      f""""files_recap":$filesR,"files_fragmented":$filesFrag,""" +
      f""""files_compacted":$fAfter,"cells_folded":$nFolded,""" +
      f""""compact_sec":$compactSec%.2f,""" +
      f""""serve_recap_sec":$serveRSec%.2f,"serve_fragmented_sec":$serveFragSec%.2f,""" +
      f""""serve_compacted_sec":$serveCmpSec%.2f,""" +
      f""""serve_penalty_fragmented":${serveFragSec / serveCmpSec}%.2f,""" +
      f""""auto_append_secs":${arr(autoSecs)},""" +
      f""""auto_routes":${routesTaken.map(r => s""""$r"""").mkString("[", ",", "]")},""" +
      f""""auto_first_ratio":${autoRoutes.head._1.ratio}%.1f,""" +
      f""""results_identical":true}""")
    require(fBefore == filesFrag && fAfter < fBefore,
      s"compaction did not fold the fragment debt: $fBefore -> $fAfter")
    spark.stop()
  }
}

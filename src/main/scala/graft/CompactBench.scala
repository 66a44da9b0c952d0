package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileUtil, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

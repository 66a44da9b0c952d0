package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement harness (optimization guide §1.1/§7.1): run the named
  * queries once warmed + once profiled under a SparkListener and print
  * a per-job breakdown — wall seconds, task count, shuffle read/write
  * bytes, input bytes — so the expensive job inside a multi-job
  * lifecycle query (or the expensive stage inside a one-job query) is
  * identified by measurement, not guesswork. The UI is disabled in the
  * bench contract, so this is the offline stand-in for the Stages tab.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.QueryProfile q79_postings_compact ..."
  */
object QueryProfile {

  final class Collector extends SparkListener {
    case class JobRow(id: Int, desc: String, t0: Long, var t1: Long = 0L,
      var tasks: Int = 0, var shufRead: Long = 0L, var shufWrite: Long = 0L,
      var input: Long = 0L, var taskTimeMs: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, JobRow]
    private val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobs(e.jobId) = JobRow(e.jobId, desc.take(60), e.time)
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.tasks += 1
        val m = e.taskMetrics
        if (m != null) {
          j.shufRead += m.shuffleReadMetrics.totalBytesRead
          j.shufWrite += m.shuffleWriteMetrics.bytesWritten
          j.input += m.inputMetrics.bytesRead
          j.taskTimeMs += m.executorRunTime
        }
      }
    def report(): String = {
      val sb = new StringBuilder
      var total = 0.0
      jobs.values.foreach { j =>
        val sec = (j.t1 - j.t0) / 1e3
        total += sec
        sb.append(f"  job ${j.id}%3d ${sec}%7.3f s  tasks=${j.tasks}%4d " +
          f"in=${j.input / 1048576.0}%8.2fM sr=${j.shufRead / 1048576.0}%7.2fM " +
          f"sw=${j.shufWrite / 1048576.0}%7.2fM cpu=${j.taskTimeMs / 1e3}%8.2fs" +
          f"  ${j.desc}%s\n")
      }
      sb.append(f"  sum-of-jobs ${total}%.3f s over ${jobs.size} jobs\n")
      sb.toString
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.validate(spark, sfDir)
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      try run(name) finally spark.catalog.clearCache() // warm-up
      val c = new Collector
      spark.sparkContext.addSparkListener(c)
      val t0 = System.nanoTime()
      try run(name) finally spark.catalog.clearCache()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the async listener bus drain before reading the collector
      // (listenerBus.waitUntilEmpty is private[spark]; a short sleep is
      // fine for a dev profiling harness)
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(c)
      println(f"[profile] $name wall=${wall}%.3f s")
      println(c.report())
    }
    spark.stop()
  }
}

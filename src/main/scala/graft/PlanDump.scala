package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement harness (optimization guide §1.1/§7.2): dump
  * `.explain("formatted")` for every declared query (or the named
  * subset) to `<outDir>/<query>.txt`, one file per query, so plan
  * claims (Exchange count, join strategy, PushedFilters/ReadSchema)
  * are reviewable offline without a Spark installation.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [query ...]
  *
  * The dump is the PRE-execution plan (`AdaptiveSparkPlan
  * isFinalPlan=false` under AQE) — the shape Catalyst chose, which is
  * what the plan-diff evidence in OPTIMIZATION_r*.md cites. Queries
  * whose plan depends on side effects (the artifact lifecycles build
  * temp indexes eagerly inside the builder) still produce their final
  * serve-plan here because the builder runs to completion before
  * `explain` is taken on the returned frame.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = graft.sources.Config.resolveDir(args(0))
    val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.validate(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // queryExecution.explainString == explain("formatted"), but
          // returned as a String instead of printed to stdout
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONE declared query repeatedly (same session config
  * as [[Bench]]) and optionally dump its formatted plan. Usage:
  *   sbt "runMain graft.BenchOne q14_events_json 3 explain"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val explain = args.contains("explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.validate(spark, sfDir) // fail fast on snapshot drift, as Bench does

    // clearCache between iterations, same as Bench: a query's persisted
    // intermediates are scoped to its own run. Without it, iteration 2+
    // re-persists the same canonicalized plan (CacheManager "already
    // cached" warnings) and times measure cache-hit plans with
    // accumulating block-eviction pressure — neither is the cold-query
    // figure this harness exists to report. The clear runs OUTSIDE the
    // nanoTime bracket (Bench aligned the same way): the driver-side
    // unpersist is teardown, not query execution.
    def run(): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    if (explain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    try run() finally spark.catalog.clearCache() // warm-up
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      try {
        run()
        println(f"[$name] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}

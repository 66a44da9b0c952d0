package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobs.DocumentQueries

/** Measures the hashed-shuffle-key twins against their string-keyed
  * declared queries at a caller-chosen scale — the number behind the
  * "promote hashed keys to the operator default" decision (SURVEY
  * §6.1.4). The two candidates are the only remaining declared queries
  * whose largest exchanges carry raw gram STRINGS (~40 bytes/key):
  * q52's novelty postings and q65's bigram LM; the pair-relation family
  * already ships 8-byte `xxhash64` posting keys inside
  * [[graft.operators.Dedup.ngramJaccard]].
  *
  * Protocol = Bench's: noop sink, one warm-up, median-of-3, cache
  * cleared OUTSIDE the timed bracket.
  *
  * Usage: `tools/run_main.sh graft.HashedKeyBench [sfDir] [queryName]`.
  * An optional second argument restricts the run to one pair — lets an
  * interrupted sweep resume without re-paying the completed pair.
  *
  * `SPARK_GRAFT_MASTER=local-cluster[2,2,2048]` (with SPARK_HOME set
  * and the package jar built) reruns the same protocol across the
  * process boundary — §6.1.5's local ratios price hash-vs-string keys
  * with an in-memory exchange, which UNDERSTATES the hashed form's
  * edge: the wire run adds real serialize/socket/deserialize bytes per
  * key, the term that dominates at cluster scale.
  */
object HashedKeyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scaledata/sf10")
    val only = args.drop(1).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder =
      if (master.startsWith("local-cluster")) ClusterHarness.builder(master)
      else GraftSession.defaults(SparkSession.builder()
        .master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.validate(spark, sfDir, Seq("documents"))

    def time(df: => DataFrame): Double = {
      def run(): Unit = df.write.format("noop").mode("overwrite").save()
      try run() finally spark.catalog.clearCache() // warm-up
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { run(); (System.nanoTime() - t0) / 1e9 }
        finally spark.catalog.clearCache()
      }
      times.sorted.apply(1) // median
    }

    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q52_novelty",
        () => DocumentQueries.q52Novelty(spark, sfDir),
        () => DocumentQueries.q52NoveltyHashed(spark, sfDir)),
      ("q65_bigram_surprise",
        () => DocumentQueries.q65BigramSurprise(spark, sfDir),
        () => DocumentQueries.bigramSurpriseHashed(spark, sfDir)))
    // a mistyped name would otherwise filter out every pair and the
    // bench would silently run nothing
    only.foreach(q => require(pairs.exists(_._1 == q),
      s"unknown query: $q (have ${pairs.map(_._1).mkString(", ")})"))
    pairs.filter(p => only.forall(_ == p._1)).foreach { case (name, strKeyed, hashKeyed) =>
      val s = time(strKeyed())
      val h = time(hashKeyed())
      println(f"""{"query":"$name","string_sec":$s%.3f,"hashed_sec":$h%.3f,"speedup":${s / h}%.2f}""")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress invariance sweep over the FULL declared query surface
  * (the round-9 task the r8 verdict prescribed): run every
  * SparkEntry.queries entry against a [[ScaleData]] corpus and assert
  * the results are
  *  1. partition-invariant — identical under a very different
  *     execution shape (shuffle partitions 32 → 7, input split size
  *     128m → 4m), the class of defect the sf0.1 sweep caught in q10's
  *     order-ambiguous prefix sums (commit 00e0ddc); and
  *  2. rerun-stable — identical when the same configuration runs
  *     again (no wall-clock, random, or map-iteration dependence).
  *
  * A query's digest is (row count, bit_xor of per-row xxhash64 over
  * name-sorted columns, sum of the hashes mod a prime) — order-free,
  * collision-resistant in combination, and exact: any value drifting
  * by one bit flips the digest. Floats are hashed bitwise, so this is
  * STRICTER than the DuckDB gate's 1e-9 tolerance; queries that round
  * before emitting (the declared contract) must digest identically.
  *
  * Also preflights the generated schemas against the driver fixtures —
  * a generator that drifted from the fixture shapes would make every
  * downstream check vacuous.
  *
  * Usage: `runMain graft.ScaleSweep [dataDir] [onlyQuery...]` — prints
  * one line per query, exits nonzero on any mismatch.
  */
object ScaleSweep {

  final case class Digest(rows: Long, xor: Long, sum: Long)

  def digest(df: DataFrame): Digest = {
    val cols = df.columns.sorted.map(col)
    val r = df
      .select(xxhash64(cols: _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
        sum(pmod(col("h"), lit(1000003L))).as("s"))
      .collect()(0)
    Digest(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scaledata/sf1")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // preflight: the generator must produce the fixture schemas exactly
    val ref = "/root/testdata/sf0.1"
    var schemaDrift = 0
    Tables.all.foreach { t =>
      val a = Tables.load(spark, ref, t).schema
      val b = Tables.load(spark, dir, t).schema
      if (a != b) {
        schemaDrift += 1
        println(s"[sweep] SCHEMA DRIFT $t\n  fixtures:  $a\n  scaledata: $b")
      }
    }
    require(schemaDrift == 0, s"$schemaDrift table(s) drifted from fixture schemas")

    def runWith(name: String, shuffle: Int, maxPartitionBytes: String): Digest = {
      spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      try digest(SparkEntry.queries(name)(spark, dir))
      finally spark.catalog.clearCache()
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val a = runWith(name, 32, "128m")
        val b = runWith(name, 7, "4m")
        val a2 = runWith(name, 32, "128m")
        val sec = (System.nanoTime() - t0) / 1e9
        if (a == b && a == a2)
          println(f"[sweep] OK   $name rows=${a.rows} ($sec%.1f s)")
        else {
          failures += name
          println(f"[sweep] FAIL $name ($sec%.1f s)\n  cfgA:  $a\n  cfgB:  $b\n  rerun: $a2")
        }
      } catch {
        case e: Throwable =>
          failures += name
          println(s"[sweep] ERROR $name: ${e.toString.take(300)}")
      }
    }
    println(s"[sweep] ${names.size - failures.size}/${names.size} invariant; " +
      s"failures: ${failures.mkString(", ")}")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-stress for the events family (the r10 verdict's last untested
  * scale claim): q50/q51/q58/q59 key every shuffle on `user_id`, and a
  * production event stream always has hot users (bots, shared
  * accounts) — one key holding a double-digit percent of the table.
  * This harness plants exactly that corpus and validates the two
  * things a 1000-executor deployment needs:
  *
  *  1. CORRECTNESS under AQE skew-splitting: a skewed SMJ partition
  *     split N ways re-reads the other side's matching partition into
  *     every split — results must not change. Digests
  *     ([[ScaleSweep.digest]]) are compared between a run with AQE
  *     skew-join handling ON (thresholds lowered so the planted skew
  *     trips it at local scale) and a run with it OFF.
  *  2. ENGAGEMENT: the executed plan under the ON config must actually
  *     contain skew-split shuffle reads (`AQEShuffleRead ... skewed`) —
  *     otherwise the "AQE handles it" claim was vacuous at this shape.
  *
  * The hot user rides the q58 interval join hardest: its pair fan is
  * views × clicks-within-24h, quadratic-ish in the key's share of the
  * table, which is exactly the partition AQE must split.
  *
  * Events are written through [[ScaleData.events]]'s raw-nanos form,
  * so the run also exercises the legacy LONG loader branch (and its
  * footer guard) end-to-end.
  *
  * Usage: `runMain graft.SkewStress [nEvents] [hotPct] [explain]` —
  * prints one line per query, exits nonzero on a digest mismatch;
  * `explain` additionally dumps join/exchange plan lines for queries
  * whose skew split did not engage.
  */
object SkewStress {

  def main(args: Array[String]): Unit = {
    // flags are words, sizes are digits — accept them in any order
    val sizes = args.filter(_.forall(_.isDigit))
    val n = sizes.headOption.map(_.toLong).getOrElse(1000000L)
    val hotPct = sizes.lift(1).map(_.toInt).getOrElse(15)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // hotPct% of all events collapse onto user 0; the rest keep their
    // uniform spread over 100k users. Deterministic (hash-of-id), like
    // every ScaleData column.
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    ScaleData.events(spark, n, users = 100000L)
      .withColumn("user_id",
        when(pmod(xxhash64(lit("hot"), $"event_id"), lit(100)) < hotPct, 0L)
          .otherwise($"user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // gate the synthesized corpus before timing: the generator rides
    // ScaleData/repack-adjacent paths that have drifted encodings once
    // already (the r11 stale-footer bug) — a drifted ts here would make
    // every digest below compare wrong-vs-wrong
    Tables.validate(spark, dir, Seq("events"))

    val queries = Seq("q50_funnel", "q51_retention",
      "q58_attributed_clicks", "q59_attributed_outer")

    def setSkewConfs(on: Boolean): Unit = {
      // no broadcast joins in EITHER config: at this local scale AQE
      // would broadcast the few-MB sides (skew-immune, but not the
      // plan a 100 TB events table can take) — pin the sort-merge
      // shape the cluster-scale query actually runs so the skew
      // machinery under test is the one that matters there
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      // lowered so the planted hot partition (sub-MB shuffle bytes at
      // this local scale — the join sides project 3 narrow columns)
      // trips the splitter; cluster defaults (256 MB) target real
      // executor-sized partitions
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      // the events rollups deliberately reuse the join's user_id
      // partitioning (no second exchange — q58's scaladoc), and AQE
      // will NOT split a skewed join partition when downstream reuse
      // makes the split require a new shuffle. force = accept that
      // extra exchange; the right call exactly when one hot key
      // dominates the join (the trade this harness documents).
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", on.toString)
    }

    var failures = 0
    queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      setSkewConfs(on = true)
      // engagement check on ITS OWN executed QueryExecution: AQE
      // finalizes a plan only when that exact QueryExecution runs — a
      // `.write` (and even `.count`) action goes through a NEW one, so
      // inspecting dfOn after it would read the un-finalized initial
      // plan, no AQEShuffleRead nodes anywhere. toRdd.count() drives
      // this QueryExecution's own AdaptiveSparkPlanExec to the final
      // plan (all rows stay on the executors).
      val dfOn = fn(spark, dir)
      val qeOn = dfOn.queryExecution
      qeOn.toRdd.count()
      val planOn = qeOn.executedPlan.toString
      val engaged = planOn.contains("skewed")
      if (!engaged && args.contains("explain"))
        planOn.linesIterator
          .filter(l => l.contains("ShuffleRead") || l.contains("Join") ||
            l.contains("Exchange"))
          .take(12).foreach(l => println("[skew]   " + l.trim.take(160)))
      val dOn = ScaleSweep.digest(fn(spark, dir))
      spark.catalog.clearCache()
      setSkewConfs(on = false)
      val dOff = ScaleSweep.digest(fn(spark, dir))
      spark.catalog.clearCache()
      val ok = dOn == dOff
      if (!ok) failures += 1
      println(s"[skew] ${if (ok) "OK  " else "MISMATCH"} $name " +
        s"skewSplitEngaged=$engaged rows=${dOn.rows}" +
        // a mismatch is the event this harness exists to catch — dump
        // both digests so the diverging component (rows/xor/sum) and
        // magnitude are in the output, not lost to a boolean
        (if (ok) "" else s" skewOn=$dOn skewOff=$dOff"))
    }
    println(s"[skew] ${queries.size - failures}/${queries.size} digest-stable " +
      s"under AQE skew-splitting (n=$n, hot=$hotPct%)")
    // the generated corpus is tens of MB per run — remove it rather
    // than letting repeated invocations accumulate in the temp dir
    val hDir = new org.apache.hadoop.fs.Path(dir)
    hDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hDir, true)
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

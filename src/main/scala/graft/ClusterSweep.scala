package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.CorpusIngest

/** Shared session shape for the process-boundary legs: every harness
  * that runs a `local-cluster[n,cores,mem]` master routes through
  * [[builder]] so the executor JVMs get the same JDK-17 module opens,
  * classpath shipping, and serializer as ClusterSweep's audited leg.
  *
  * What makes this leg different from twelve rounds of `local[n]`:
  *  - the app classes reach executors via `spark.jars` — the driver's
  *    file server actually serves the jar and each executor's
  *    `MutableURLClassLoader` loads graft classes from the fetched
  *    copy, the same path a real `--jars` submit takes (NOT
  *    `extraClassPath`, which would quietly fall back to the shared
  *    filesystem and test nothing);
  *  - `KryoSerializer` carries the data/broadcast path, so the
  *    `Broadcast[BloomFilter]` handle in
  *    [[graft.expressions.BloomProbe]] is torrent-delivered and
  *    deserialized in a JVM that never saw the driver-side object;
  *  - shuffles cross real sockets between two 2-core / 2 GiB executor
  *    processes, so a digest mismatch from map-iteration or
  *    serialization nondeterminism has somewhere to come from.
  */
object ClusterHarness {

  /** Mirrors build.sbt's jdk17AddOpens — a forked executor JVM is not
    * launched by sbt, so it must carry its own module opens. */
  val executorJavaOptions: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  val defaultJar = "target/scala-2.13/clinicalbispark_2.13-0.1.0.jar"

  /** A builder for `master`, shipping `jar` to executors. Worker
    * processes resolve their launch scripts through SPARK_HOME — fail
    * fast with the remedy rather than let the worker die opaquely. */
  def builder(master: String, jar: String = defaultJar): SparkSession.Builder = {
    require(!master.startsWith("local-cluster") || sys.env.contains("SPARK_HOME"),
      "local-cluster mode forks executor JVMs through the Spark distro: " +
        "run with SPARK_HOME=/opt/spark")
    val jarAbs = new java.io.File(jar).getAbsoluteFile
    require(jarAbs.isFile,
      s"$jarAbs missing — run `sbt package` first (executors fetch app " +
        "classes from this jar via the driver's file server)")
    GraftSession.defaults(SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.jars", jarAbs.toString)
      .config("spark.executor.memory", "2g")
      // the executor command builder resolves the distro layout through
      // SPARK_SCALA_VERSION, normally exported by load-spark-env.sh —
      // a raw-java launch never ran it, and Command.environment is the
      // seam that reaches the in-process Worker's builder
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .config("spark.executor.extraJavaOptions", executorJavaOptions)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer"))
  }

  /** Run `body` in a fresh session and tear the context down fully —
    * two legs with different masters cannot share a JVM-wide context. */
  def withSession[A](b: SparkSession.Builder)(body: SparkSession => A): A = {
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try body(spark)
    finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

/** The process-boundary invariance sweep (SURVEY §6.1.7): every prior
  * green result ran inside ONE JVM, where "broadcast" is a pointer
  * copy and "shuffle" never touches a socket. This harness runs the
  * heavy subset — q63 (broadcast-handle bloom screen), q21 (LSH band
  * join), q42 (checkpointed component propagation), q34 (IVF
  * postings) — plus the exact-dedup STREAMING seam and the
  * large-cell-count IVF kernel route (the second broadcast-handle
  * kernel) once under plain `local[4]` and once under
  * `local-cluster[2,2,2048]` (two separate executor processes,
  * 2 cores / 2 GiB each), and requires digest-equality (same
  * order-free digest as [[ScaleSweep]]).
  *
  * Usage:
  *   sbt package
  *   SPARK_HOME=/opt/spark tools/run_main.sh graft.ClusterSweep \
  *     [sfDir] [query...]
  */
object ClusterSweep {

  val defaultQueries: Seq[String] = Seq(
    "q63_exact_index_screen", "q21_minhash_lsh",
    "q42_dedup_clusters", "q34_ann_ivf")

  /** The exact-dedup ingest seam, batch-sliced as IngestBench does it:
    * seed the hash index + bloom from the first slice, stream the rest
    * one file per micro-batch, and digest the kept corpus. Exercises
    * `localCheckpoint` on executor block managers and the per-batch
    * bloom broadcast across the process boundary. */
  private def exactSeamDigest(spark: SparkSession, sfDir: String,
      nBatches: Int = 4): ScaleSweep.Digest = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").select($"doc_id", $"text")
    val n = docs.count()
    val sz = (n + nBatches - 1) / nBatches
    def slice(i: Int): DataFrame =
      docs.filter($"doc_id" >= i * sz && $"doc_id" < (i + 1) * sz)

    val staging = Files.createTempDirectory("graft_clustersweep_stage").toString
    (1 until nBatches).foreach { i =>
      slice(i).coalesce(1).write.mode("append").parquet(staging)
      Thread.sleep(1100) // distinct mtimes -> deterministic file order
    }
    val idx = Files.createTempDirectory("graft_clustersweep_idx").toString
    val bloom = Files.createTempDirectory("graft_clustersweep_bloom").toString
    val corpus = Files.createTempDirectory("graft_clustersweep_corp").toString
    val seed = Dedup.exactHashIndex(slice(0))
    seed.write.mode("overwrite").parquet(idx)
    Dedup.exactIndexBloom(seed, expectedItems = 2L * n)
      .write.mode("overwrite").parquet(bloom)
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(staging)
    val q = CorpusIngest.parquetExactDedupIngest(src, idx, bloom, corpus)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ScaleSweep.digest(spark.read.parquet(corpus))
  }

  /** The large-cell-count IVF route's digest: the
    * [[graft.expressions.IvfNearestCells]] kernel carries its centroid
    * matrix as a `Broadcast[IvfCentroidSet]` handle, so this leg is the
    * torrent-delivery + Kryo + executor-cached-field test for the
    * SECOND broadcast-handle kernel (BloomProbe being the first).
    * Centroids are the first 64 corpus vectors — deterministic across
    * masters, where a per-leg k-means fit could diverge by
    * partition-order float summation. */
  private def ivfLargeDigest(spark: SparkSession,
      sfDir: String): ScaleSweep.Digest = {
    import spark.implicits._
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = emb.orderBy($"vec_id").limit(64)
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    ScaleSweep.digest(graft.operators.Similarity
      .ivfTopKLargeWithCentroids(emb, cents, probes = 4, k = 10))
  }

  /** The two-level kernel's boundary leg: same fixed first-64 centroids,
    * block-grouped (8×8), HALF the groups probed — exercises Java
    * serialization + torrent delivery of the nested
    * `Broadcast[IvfGroupedCentroidSet]` payload (group matrix + member
    * lists) into `graft_ivf_nearest_cells_2l`'s executor-cached field
    * across the process boundary, with the group prune actually binding. */
  private def ivfTwoLevelDigest(spark: SparkSession,
      sfDir: String): ScaleSweep.Digest = {
    import spark.implicits._
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = emb.orderBy($"vec_id").limit(64)
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    ScaleSweep.digest(graft.operators.Similarity
      .ivfTopKTwoLevelFixed(emb, cents, groupSize = 8, probes = 4, k = 10,
        groupProbes = 4))
  }

  /** The postings-ARTIFACT lifecycle leg (r13): fixed first-64 cells
    * block-grouped (8×8), kernel-built cell-partitioned postings
    * (1-file-per-cell layout), then BOUNDED-QUERY serving through the
    * partition-pruned route — exercises, across the process boundary:
    * the grouped kernel build's broadcast, the repartition-by-cell
    * partitioned write, the probe-set driver collect, and the IN
    * partition filter pruning a directory tree that forked executors
    * wrote. */
  private def postingsPrunedDigest(spark: SparkSession,
      sfDir: String): ScaleSweep.Digest = {
    import spark.implicits._
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = emb.orderBy($"vec_id").limit(64)
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val gcs = graft.expressions.IvfAssignKernel
      .fixedGroupedCentroidSet(cents, groupSize = 8)
    val dir = Files.createTempDirectory("graft_clustersweep_post")
      .resolve("postings").toString
    graft.operators.Similarity.saveIvfPostings(
      graft.operators.Similarity.ivfPostingsFromGrouped(emb, gcs), dir)
    val postings = graft.operators.Similarity.readPostings(spark, dir)
    val queries = emb.filter($"vec_id" % 100 === 0)
    ScaleSweep.digest(graft.operators.Similarity.ivfTopKFromPostingsPruned(
      queries, gcs.flat.cents, postings, probes = 4, k = 10))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scaledata/sf1")
    val queries = if (args.length > 1) args.drop(1).toSeq else defaultQueries
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    def leg(master: String): (Map[String, ScaleSweep.Digest],
        Seq[(String, ScaleSweep.Digest)]) =
      ClusterHarness.withSession(ClusterHarness.builder(master)) { spark =>
        Tables.validate(spark, sfDir, Seq("documents", "embeddings"))
        val ds = queries.map { name =>
          val t0 = System.nanoTime()
          val d =
            try ScaleSweep.digest(SparkEntry.queries(name)(spark, sfDir))
            finally spark.catalog.clearCache()
          println(f"[$master] $name rows=${d.rows} " +
            f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
          name -> d
        }.toMap
        val t0 = System.nanoTime()
        val seam = exactSeamDigest(spark, sfDir)
        println(f"[$master] exact_ingest_seam kept=${seam.rows} " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
        val t1 = System.nanoTime()
        val ivf = ivfLargeDigest(spark, sfDir)
        println(f"[$master] ivf_large_kernel rows=${ivf.rows} " +
          f"(${(System.nanoTime() - t1) / 1e9}%.1f s)")
        val t2 = System.nanoTime()
        val ivf2l = ivfTwoLevelDigest(spark, sfDir)
        println(f"[$master] ivf_2l_kernel rows=${ivf2l.rows} " +
          f"(${(System.nanoTime() - t2) / 1e9}%.1f s)")
        val t3 = System.nanoTime()
        val pruned = postingsPrunedDigest(spark, sfDir)
        println(f"[$master] ivf_postings_pruned rows=${pruned.rows} " +
          f"(${(System.nanoTime() - t3) / 1e9}%.1f s)")
        (ds, Seq("exact_ingest_seam" -> seam, "ivf_large_kernel" -> ivf,
          "ivf_2l_kernel" -> ivf2l, "ivf_postings_pruned" -> pruned))
      }

    // local leg at the cluster's core count so any divergence is the
    // process boundary, not parallelism (digests are shape-free anyway)
    val (localD, localExtra) = leg("local[4]")
    val (clusterD, clusterExtra) = leg("local-cluster[2,2,2048]")

    var failures = List.empty[String]
    queries.foreach { name =>
      val (a, b) = (localD(name), clusterD(name))
      if (a == b) println(s"[cluster-sweep] OK   $name rows=${a.rows}")
      else {
        failures ::= name
        println(s"[cluster-sweep] FAIL $name\n  local:   $a\n  cluster: $b")
      }
    }
    localExtra.zip(clusterExtra).foreach { case ((name, a), (_, b)) =>
      if (a == b) println(s"[cluster-sweep] OK   $name rows=${a.rows}")
      else {
        failures ::= name
        println(s"[cluster-sweep] FAIL $name\n  local:   $a\n  cluster: $b")
      }
    }
    val total = queries.size + localExtra.size
    println(s"[cluster-sweep] ${total - failures.size}/$total " +
      "process-boundary invariant; failures: " +
      failures.reverse.mkString(", "))
    if (failures.nonEmpty) sys.exit(1)
  }
}

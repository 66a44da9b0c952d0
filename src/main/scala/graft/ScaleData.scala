package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic star-schema generator for scale-stress sweeps BEYOND the
  * driver-provided fixtures (TESTDATA.md caps at sf0.1): same tables,
  * schemas, value domains, and planted structure (exact + near-dup
  * documents, clustered embeddings, funnel-able events) at a caller-
  * chosen multiple of the sf0.1 row counts. Output lives under the
  * repo's gitignored `scaledata/` — never inside `/root/testdata`.
  *
  * Every column is a PURE per-row hash expression of the row id
  * (xxhash64 — no RNG stream, no window, no join), so the data is
  * bit-identical regardless of partition count, executor count, or
  * task retries — the property the ScaleSweep invariance checks then
  * assert over the QUERY surface. This is also the 100-TB-honest way
  * to synthesize: spark.range parallelizes embarrassingly, and a
  * 1000-executor cluster generates petabytes with zero coordination.
  *
  * The driver's generator (seed=42) is not reproduced verbatim — its
  * code is not available — but the shapes match: vocab-31 word salad
  * documents with ~4% planted duplicates (half exact, half one-token
  * near-dups), 20 sources, en-heavy 5-language mix, 10-label clustered
  * 64-dim embeddings with planted near-identical vectors, 5-type
  * events over a 30-day window, and the TPC-H-ish relational star with
  * the same key ranges, statuses, and date windows.
  *
  * Usage: `runMain graft.ScaleData [outDir] [multiplier]` (defaults
  * `scaledata/sf1`, 10×sf0.1). Spark writes each table as a parquet
  * DIRECTORY; `tools/repack_scaledata.py` then repacks each into the
  * single-file `<table>.parquet` layout the fixtures use (and retypes
  * `events.ts` to parquet timestamp[us], matching the driver's current
  * fixtures so Tables.load and the DuckDB oracle read both the same
  * way).
  */
object ScaleData {

  private def h(tag: String, cols: Column*): Column =
    xxhash64((lit(tag) +: cols): _*)
  /** Uniform integer in [0, n) as a pure function of (tag, cols). */
  private def hmod(tag: String, n: Long, cols: Column*): Column =
    pmod(h(tag, cols: _*), lit(n))
  /** Uniform double in [0, 1) at 1e-6 resolution. */
  private def uni(tag: String, cols: Column*): Column =
    hmod(tag, 1000000L, cols: _*).cast("double") / 1e6

  private def pick(choices: Seq[String], tag: String, cols: Column*): Column =
    element_at(array(choices.map(lit): _*),
      hmod(tag, choices.size.toLong, cols: _*).cast("int") + 1)

  val vocab: Seq[String] = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan", "slow",
    "small", "sort", "spark", "stream", "table", "the", "value", "vector",
    "window")

  def documents(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val vocabCol = array(vocab.map(lit): _*)
    // 30-89 tokens of word salad, fully determined by the seed id
    def render(seed: Column): Column =
      concat_ws(" ", transform(
        sequence(lit(1L), hmod("ntok", 60L, seed) + lit(30L)),
        i => element_at(vocabCol,
          hmod("w", vocab.size.toLong, seed, i).cast("int") + 1)))
    val lang = {
      val lb = hmod("lang", 20L, col("doc_id"))
      when(lb < 9, "en").when(lb < 12, "de").when(lb < 15, "es")
        .when(lb < 18, "fr").otherwise("zh")
    }
    spark.range(n).select($"id".as("doc_id"))
      // ~4% duplicates of a (hash-chosen) earlier doc: half verbatim,
      // half with one appended token — exercises exact dedup, MinHash,
      // SimHash, winnowing, and the index-screen paths at scale
      .withColumn("is_dup",
        $"doc_id" > 0 && hmod("isdup", 25L, $"doc_id") === 0)
      .withColumn("seed",
        when($"is_dup", pmod(h("base", $"doc_id"), $"doc_id"))
          .otherwise($"doc_id"))
      .withColumn("text",
        when($"is_dup" && hmod("near", 2L, $"doc_id") === 0,
          concat(render($"seed"), lit(" dup")))
          .otherwise(render($"seed")))
      .withColumn("lang", lang)
      .withColumn("source", concat(lit("src"), pmod($"doc_id", lit(20L))))
      .withColumn("n_chars", length($"text").cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val dim = 64
    def labelOf(id: Column): Column = hmod("lb", 10L, id).cast("int")
    spark.range(n).select($"id".as("vec_id"))
      // ~2.5% near-identical copies of the previous vector (tiny jitter)
      // — the SemDeDup / embedding-near-dup signal
      .withColumn("near", $"vec_id" > 0 && hmod("ndv", 40L, $"vec_id") === 0)
      .withColumn("seed", when($"near", $"vec_id" - 1).otherwise($"vec_id"))
      .withColumn("label", labelOf($"seed"))
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)), j =>
        ((hmod("c", 2001L, $"label", j).cast("double") / 1000.0 - 1.0) +
          (hmod("nz", 2001L, $"seed", j).cast("double") / 1000.0 - 1.0) * 0.15 +
          when($"near",
            (hmod("jit", 2001L, $"vec_id", j).cast("double") / 1000.0 - 1.0) * 0.01)
            .otherwise(0.0)).cast("float")))
      .select("vec_id", "embedding", "label")
  }

  /** Mixture-of-clusters embedding corpus — the recall-measurement twin
    * of [[embeddings]]. The fixture embeddings (and [[embeddings]]'s
    * 10-label blend) carry so little — or such coarse — cluster
    * structure that IVF recall ≈ scanned fraction there (SURVEY §6.2's
    * own caveat), which makes the (cells, probes) knee and the
    * SimilaritySpec floor numbers lower bounds with limited predictive
    * value. Real embedding corpora are mixtures of MANY local clusters;
    * this generator produces that shape with the same no-RNG
    * discipline as every other ScaleData column (pure per-row xxhash64
    * — bit-identical under any partitioning):
    *
    *  - `clusters` latent centroids, each coordinate uniform in [-1,1]
    *    as a hash of (cluster, dim);
    *  - per-row cluster assignment by hash of vec_id;
    *  - per-row jitter uniform in ±`spread` per coordinate — `spread`
    *    sets the intra/inter cluster distance ratio (at 64 dims,
    *    inter-centroid distance ≈ 6.5; spread 0.35 gives intra ≈ 2.3,
    *    separated but with boundary overlap, the regime where probing
    *    order matters and a knee exists);
    *  - the same ~2.5% planted near-identical copies as [[embeddings]]
    *    so the SemDeDup/near-dup paths stay exercised.
    *
    * Schema and value domains match the fixture `embeddings` table
    * exactly (`label` folds the latent cluster into 0..9). */
  def clusteredEmbeddings(spark: SparkSession, n: Long, clusters: Int = 100,
      spread: Double = 0.35): DataFrame = {
    import spark.implicits._
    val dim = 64
    spark.range(n).select($"id".as("vec_id"))
      .withColumn("near", $"vec_id" > 0 && hmod("ndv", 40L, $"vec_id") === 0)
      .withColumn("seed", when($"near", $"vec_id" - 1).otherwise($"vec_id"))
      .withColumn("cluster", hmod("cl", clusters.toLong, $"seed").cast("int"))
      .withColumn("label", pmod($"cluster", lit(10)).cast("int"))
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)), j =>
        ((hmod("cc", 2001L, $"cluster", j).cast("double") / 1000.0 - 1.0) +
          (hmod("cj", 2001L, $"seed", j).cast("double") / 1000.0 - 1.0) * spread +
          when($"near",
            (hmod("jit", 2001L, $"vec_id", j).cast("double") / 1000.0 - 1.0) * 0.01)
            .otherwise(0.0)).cast("float")))
      .select("vec_id", "embedding", "label")
  }

  def events(spark: SparkSession, n: Long, users: Long): DataFrame = {
    import spark.implicits._
    // naive (NTZ) nanos since epoch across Jan 2024, µs granularity —
    // repacked to parquet timestamp[us] to match the fixtures
    val baseNs = 1704067200000000000L // 2024-01-01T00:00:00
    spark.range(n).select($"id".as("event_id"))
      .withColumn("ts",
        lit(baseNs) + hmod("ts", 30L * 86400L * 1000000L, $"event_id") * 1000L)
      .withColumn("user_id", hmod("u", users, $"event_id"))
      .withColumn("event_type",
        pick(Seq("view", "click", "purchase", "signup", "error"), "et", $"event_id"))
      .withColumn("value", round(uni("v", $"event_id") * 560.0, 2))
      .withColumn("props",
        concat(lit("{\"k\": "), hmod("k", 100L, $"event_id"), lit("}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }

  def customer(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select($"id".as("c_custkey"))
      .withColumn("c_name", format_string("Customer#%09d", $"c_custkey"))
      .withColumn("c_nationkey", hmod("cn", 25L, $"c_custkey").cast("int"))
      .withColumn("c_acctbal",
        round(lit(-1000.0) + uni("cb", $"c_custkey") * 11000.0, 2))
      .withColumn("c_mktsegment",
        pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
          "MACHINERY"), "cm", $"c_custkey"))
  }

  def supplier(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select($"id".as("s_suppkey"))
      .withColumn("s_name", format_string("Supplier#%09d", $"s_suppkey"))
      .withColumn("s_nationkey", hmod("sn", 25L, $"s_suppkey").cast("int"))
      .withColumn("s_acctbal",
        round(lit(-1000.0) + uni("sb", $"s_suppkey") * 11000.0, 2))
  }

  def part(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select($"id".as("p_partkey"))
      .withColumn("p_name", concat(
        pick(Seq("large", "hot", "blue", "red", "small", "green", "cold",
          "dark"), "pa", $"p_partkey"), lit(" "),
        pick(Seq("ring", "bolt", "screw", "nut", "washer", "gear"), "pn",
          $"p_partkey")))
      .withColumn("p_brand",
        concat(lit("Brand#"), hmod("pb", 25L, $"p_partkey") + 1))
      .withColumn("p_type",
        pick(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
          "STANDARD"), "pt", $"p_partkey"))
      .withColumn("p_size", (hmod("ps", 50L, $"p_partkey") + 1).cast("int"))
      .withColumn("p_retailprice",
        round(lit(900.0) + uni("pr", $"p_partkey") * 100.0, 2))
  }

  def orders(spark: SparkSession, n: Long, customers: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).select($"id".as("o_orderkey"))
      .withColumn("o_custkey", hmod("oc", customers, $"o_orderkey"))
      .withColumn("o_orderstatus", pick(Seq("O", "F", "P"), "os", $"o_orderkey"))
      .withColumn("o_totalprice",
        round(lit(1000.0) + uni("op", $"o_orderkey") * 499000.0, 2))
      .withColumn("o_orderdate", expr(
        """timestampadd(DAY, CAST(pmod(xxhash64('od', o_orderkey), 2405) AS INT),
           TIMESTAMP_NTZ '1995-01-01 00:00:00')"""))
      .withColumn("o_orderpriority",
        pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW"), "opr", $"o_orderkey"))
  }

  def lineitem(spark: SparkSession, n: Long, parts: Long,
      suppliers: Long): DataFrame = {
    import spark.implicits._
    // exactly 4 lines per order, like the fixtures' 600k:150k ratio
    spark.range(n).select($"id")
      .withColumn("l_orderkey", expr("id div 4"))
      .withColumn("l_partkey", hmod("lp", parts, $"id"))
      .withColumn("l_suppkey", hmod("ls", suppliers, $"id"))
      .withColumn("l_linenumber", (pmod($"id", lit(4L)) + 1).cast("int"))
      .withColumn("l_quantity", (hmod("lq", 50L, $"id") + 1).cast("double"))
      .withColumn("l_extendedprice",
        round(lit(900.0) + uni("le", $"id") * 104100.0, 2))
      .withColumn("l_discount", (hmod("ld", 11L, $"id").cast("double")) / 100.0)
      .withColumn("l_tax", (hmod("lt", 9L, $"id").cast("double")) / 100.0)
      .withColumn("l_returnflag", pick(Seq("A", "N", "R"), "lr", $"id"))
      .withColumn("l_linestatus", pick(Seq("O", "F"), "ll", $"id"))
      .withColumn("l_shipdate", expr(
        """timestampadd(DAY,
             CAST(pmod(xxhash64('od', l_orderkey), 2405) AS INT) +
             CAST(pmod(xxhash64('sd', id), 120) AS INT) + 1,
           TIMESTAMP_NTZ '1995-01-01 00:00:00')"""))
      .drop("id")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("scaledata/sf1")
    val mult = args.lift(1).map(_.toLong).getOrElse(10L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val customers = 15000L * mult
    val suppliers = 1000L * mult
    val parts = 20000L * mult
    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> region(spark),
      "nation" -> nation(spark),
      "customer" -> customer(spark, customers),
      "supplier" -> supplier(spark, suppliers),
      "part" -> part(spark, parts),
      "orders" -> orders(spark, 150000L * mult, customers),
      "lineitem" -> lineitem(spark, 600000L * mult, parts, suppliers),
      "events" -> events(spark, 100000L * mult, 1500L * mult),
      "documents" -> documents(spark, 5000L * mult),
      "embeddings" -> embeddings(spark, 2000L * mult))
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
      println(s"[scaledata] wrote $name")
    }
    spark.stop()
  }
}

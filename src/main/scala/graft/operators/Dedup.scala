package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps._

/** Deduplication operators for a training-data pipeline, over a
  * `documents(doc_id, text, ...)` relation.
  *
  * Scale design: every variant avoids the quadratic all-pairs join.
  *  - exact: one hash-aggregate on md5(text).
  *  - n-gram Jaccard: inverted-index self-join on shared shingles —
  *    cost is Σ over shingles of (docs-per-shingle)², not N².
  *  - MinHash+LSH: per-row signature (array fold), band buckets, and
  *    only bucket-colliding pairs are verified — the classic
  *    shingle→minhash→band→bucket-join pipeline.
  *  - SimHash: per-row 64-bit fingerprint, 16-bit band blocking,
  *    Hamming-distance verification via bit_count(xor).
  */
object Dedup {

  /** Exact duplicate groups: md5(text) → count + representative id. */
  def exact(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupBy(md5($"text").as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_id"))
  }

  /** Distinct k-token shingles per doc (docs shorter than k dropped). */
  def shingleTable(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= k)
      .select($"doc_id", explode(shingles($"toks", k)).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard over the inverted shingle index.
    * Output: (doc_a, doc_b, jaccard) for pairs ≥ threshold. */
  def ngramJaccard(docs: DataFrame, k: Int, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // per-row distinct shingle arrays: sizes come free (no groupBy), the
    // inverted index is one explode away
    val withSh = docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= k)
      .select($"doc_id", array_distinct(shingles($"toks", k)).as("sh"))
      .cache()
    val sh = withSh.select($"doc_id", explode($"sh").as("shingle"))
    val sizes = withSh.select($"doc_id", size($"sh").as("n_shingles"))
    val common = sh.as("a")
      .join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .withColumn("jaccard",
        $"n_common".cast("double") / ($"na" + $"nb" - $"n_common"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
  }

  /** MinHash + LSH near-duplicate candidates, verified with exact
    * Jaccard. numHashes must be divisible by bands. */
  def minhashLsh(docs: DataFrame, k: Int, numHashes: Int, bands: Int,
                 threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    // signatures straight off the per-row shingle array — no
    // explode/groupBy/collect_list round-trip, zero shuffle to this point
    val sigs = docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= k)
      .withColumn("sh", array_distinct(shingles($"toks", k)))
      .select($"doc_id", $"sh", size($"sh").as("n_shingles"),
        minhashSignature($"sh", numHashes).as("sig"))
      // reused by band explode, both sides of the candidate self-join and
      // the verification joins — without this the signature lineage
      // recomputes once per consumer
      .cache()

    // band key = (band index, hash of the band's signature slice)
    val bandRows = sigs.select(
      $"doc_id",
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",", slice($"sig", b * rows + 1, rows)), lit(b))
            .as("bh"))): _*))
        .as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bh".as("band_hash"))

    val candidates = bandRows.as("a")
      .join(bandRows.as("b"),
        $"a.band" === $"b.band" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()

    // verify candidates with exact jaccard (only the candidate pairs)
    val sh = sigs.select($"doc_id", explode($"sh").as("shingle"))
    val shA = sh.select($"doc_id".as("doc_a"), $"shingle")
    val shB = sh.select($"doc_id".as("doc_b"), $"shingle")
    val common = candidates
      .join(shA, "doc_a").join(shB, Seq("doc_b", "shingle"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_common"))
    val sizes = sigs.select($"doc_id", $"n_shingles")
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .withColumn("jaccard", $"n_common".cast("double") / ($"na" + $"nb" - $"n_common"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
  }

  /** Per-document 64-bit SimHash fingerprints. */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") > 0)
      .withColumn("votes", simhashVotes($"toks"))
      .select($"doc_id", simhashPack($"votes").as("simhash"))
  }

  /** SimHash near-duplicates: 64-bit fingerprints, candidates from any
    * shared 8-bit band (8 bands), verified by Hamming ≤ maxHamming.
    * Pigeonhole guarantee: every pair with Hamming ≤ 7 shares at least
    * one clean band, so recall is exact for maxHamming ≤ 7; beyond that
    * the banding is probabilistic. */
  def simhashDup(docs: DataFrame, maxHamming: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // both sides of the band self-join read the fingerprints — cache so
    // the 64-bit vote fold runs once per doc
    val fp = simhashFingerprints(docs).cache()
    val bandRows = fp.select(
      $"doc_id", $"simhash",
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned($"simhash", b * 8).bitwiseAND(lit(0xFFL))
            .as("bh"))): _*))
        .as("bk"))
      .select($"doc_id", $"simhash", $"bk.band".as("band"), $"bk.bh".as("band_hash"))
    bandRows.as("a")
      .join(bandRows.as("b"),
        $"a.band" === $"b.band" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents").cache()

  test("exact dedup finds planted exact duplicates") {
    val planted = docs.limit(3)
      .union(docs.limit(3)) // duplicate 3 docs with new ids
      .withColumn("doc_id", monotonically_increasing_id())
    val groups = Dedup.exact(planted)
    assert(groups.count() == 3)
    assert(groups.filter($"n_copies" === 2).count() == 3)
  }

  test("ngram jaccard finds the planted near-duplicate pairs") {
    val pairs = Dedup.ngramJaccard(docs, k = 5, threshold = 0.4).collect()
    assert(pairs.nonEmpty, "expected planted near-dup pairs at sf0.001")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.4))
  }

  test("minhash LSH recovers the exact-jaccard pairs at threshold 0.6") {
    val exact = Dedup.ngramJaccard(docs, k = 5, threshold = 0.6)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, k = 5, numHashes = 32, bands = 8, threshold = 0.6)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // LSH verification step filters to true jaccard >= threshold, so the
    // result must equal the exact set restricted to candidates; with 8
    // bands × 4 rows, pairs at jaccard ≥ 0.9 are near-certain candidates.
    assert(exact.subsetOf(lsh), s"missed: ${exact.diff(lsh)}")
    assert(lsh.subsetOf(exact), s"extra: ${lsh.diff(exact)}")
  }

  test("simhash banding finds EXACTLY the pairs at hamming <= 7 (pigeonhole)") {
    // ground truth: brute-force cross join over all fingerprint pairs
    val fp = Dedup.simhashFingerprints(docs).cache()
    val a = fp.select($"doc_id".as("doc_a"), $"simhash".as("ha"))
    val b = fp.select($"doc_id".as("doc_b"), $"simhash".as("hb"))
    val truth = a.crossJoin(b)
      .filter($"doc_a" < $"doc_b" &&
        bit_count($"ha".bitwiseXOR($"hb")) <= 7)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashDup(docs, maxHamming = 7)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "expected some simhash near-dups at sf0.001")
    assert(banded == truth,
      s"missed: ${truth.diff(banded)}; extra: ${banded.diff(truth)}")
  }

  test("simhash fingerprints of near-identical docs are close") {
    val nearDup = Dedup.ngramJaccard(docs, k = 5, threshold = 0.9)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fp = Dedup.simhashFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nearDup.nonEmpty)
    val hammings = nearDup.map { case (x, y) =>
      java.lang.Long.bitCount(fp(x) ^ fp(y))
    }
    // ~99% shingle overlap ⇒ a few token swaps ⇒ small hamming; allow slack
    assert(hammings.max <= 16, s"hammings: ${hammings.mkString(",")}")
    assert(hammings.count(_ <= 7) >= nearDup.length / 2)
  }
}

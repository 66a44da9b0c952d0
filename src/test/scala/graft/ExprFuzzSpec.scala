package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps._
import graft.functions.VectorOps._

/** Seeded-random parity fuzz for the native expressions: one generated
  * corpus (unicode, empty tokens, repeated whitespace, huge/tiny rows),
  * one Spark job per contract, native vs HOF equality row by row. The
  * organic-corpus parity specs prove the real pipeline; this one walks
  * the weird corners a synthetic corpus never hits.
  */
class ExprFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  private def randomToken(): String = {
    val alphabets = Seq(
      () => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString,
      () => Seq.fill(1 + rnd.nextInt(5))(
        "日本語テキスト試験".charAt(rnd.nextInt(9))).mkString,
      () => Seq.fill(1 + rnd.nextInt(4))(
        "àéîõüßñçøæ".charAt(rnd.nextInt(10))).mkString,
      () => "",                                  // empty token (double space)
      () => new String(Character.toChars(0x1F600 + rnd.nextInt(60))))
    alphabets(rnd.nextInt(alphabets.size))()
  }

  private lazy val fuzzDocs = (0 until 300).map { i =>
    val nTokens = rnd.nextInt(40)
    (i.toLong, Seq.fill(nTokens)(randomToken()).mkString(" "))
  }.toDF("doc_id", "text")
    .withColumn("toks", tokens($"text"))
    .filter(size($"toks") > 0)
    .cache()

  test("simhash native == HOF on 300 adversarial random docs, both hash variants") {
    Seq[(Int, String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      (64, "xx64", xxhash64(_)), (60, "md5_60", md5Hash60))
      .foreach { case (bits, algo, th) =>
      val both = fuzzDocs.select(
        simhashPacked($"toks", bits, algo).as("native"),
        simhashPack(simhashVotes($"toks", bits, th), bits).as("hof"))
      assert(both.filter($"native" =!= $"hof").count() === 0,
        s"simhash parity broke at bits=$bits")
    }
  }

  test("shingle hashes native == HOF on adversarial random docs, both algos") {
    Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      ("xx64", xxhash64(_)), ("md5_60", md5Hash60)).foreach { case (algo, th) =>
      val both = fuzzDocs.filter(size($"toks") >= 3).select(
        shingleHashes($"toks", 3, algo).as("native"),
        transform(shingles($"toks", 3), g => th(g)).as("hof"))
      assert(both.filter(to_json($"native") =!= to_json($"hof")).count() === 0,
        s"shingle-hash parity broke for $algo")
    }
  }

  test("minhash native == HOF on adversarial random shingles") {
    val shingled = fuzzDocs
      .filter(size($"toks") >= 2)
      .select($"doc_id", array_distinct(shingles($"toks", 2)).as("sh"))
    val both = shingled.select(
      minhashSignatureNative($"sh", 24).as("native"),
      minhashSignature($"sh", 24).as("hof"))
    assert(both.filter(to_json($"native") =!= to_json($"hof")).count() === 0)
  }

  test("winnow mins native == HOF on adversarial random docs, several widths") {
    // bit- AND order-identical: array_distinct keeps first occurrence,
    // so a same-set-different-order bug in the deque/dedup pass fails
    // the to_json compare
    Seq(1, 2, 4, 7).foreach { w =>
      val hashed = fuzzDocs.filter(size($"toks") >= 2)
        .select(shingleHashes($"toks", 2).as("hs"))
        .filter(size($"hs") >= w)
      val both = hashed.select(
        winnowMins($"hs", w).as("native"),
        winnowMinsHof($"hs", w).as("hof"))
      assert(both.filter(to_json($"native") =!= to_json($"hof")).count() === 0,
        s"winnow parity broke at w=$w")
    }
  }

  test("native expressions evaluate with codegen fallback DISABLED") {
    // a broken doGenCode normally degrades silently to interpreted eval
    // (same results, slower); with fallback off, a codegen compile error
    // fails this test instead of hiding
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = fuzzDocs.filter(size($"toks") >= 3).select(
        simhashPacked($"toks", 64).as("sh"),
        shingleHashes($"toks", 3, "md5_60").as("hs"),
        minhashSignatureNative(array_distinct(shingles($"toks", 3)), 8).as("mh"),
        minhashBandKeysNative(array_distinct(shingles($"toks", 3)), 8, 4).as("bk"),
        winnowMins(shingleHashes($"toks", 3), 4).as("wm"))
      assert(out.count() > 0)
      val emb = Tables.load(spark, sf0001, "embeddings")
      assert(emb.select(dot(asDouble($"embedding"), asDouble($"embedding")))
        .count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("PII scrub properties on random PII-dense text: idempotent, consistent, complete") {
    // fragments mix real PII, near-misses, and plain words so matches
    // land adjacent to every boundary class
    val fragments: Seq[() => String] = Seq(
      () => s"u${rnd.nextInt(999)}@ex${rnd.nextInt(9)}.org",
      () => s"https://h${rnd.nextInt(99)}.test/p/${rnd.nextInt(999)}" +
        (if (rnd.nextBoolean()) "." else ""),
      () => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}",
      () => s"${rnd.nextInt(999)}.${rnd.nextInt(999)}.${rnd.nextInt(999)}.${rnd.nextInt(999)}",
      () => s"v${rnd.nextInt(9)}.${rnd.nextInt(9)}.${rnd.nextInt(9)}", // version
      () => s"1.2.3.4.${rnd.nextInt(99)}",           // dotted over-run
      () => "a@b",                                    // not an email (no tld)
      () => "http:/broken",                           // not a url
      () => randomToken())
    val piiDocs = (0 until 400).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(
        fragments(rnd.nextInt(fragments.size))()).mkString(" "))
    }.toDF("doc_id", "text")

    val checked = piiDocs.select(
      $"doc_id", $"text",
      piiCounts($"text").as("c"),
      redactPii($"text").as("red"))
      .withColumn("red2", redactPii($"red"))
      .withColumn("cred", piiCounts($"red"))
    // idempotent: a second scrub never changes the text (redaction
    // markers cannot combine with neighbors into new matches)
    assert(checked.filter($"red" =!= $"red2").count() === 0)
    // complete: the scrubbed text carries zero remaining PII
    assert(checked.filter(
      $"cred.n_urls" =!= 0 || $"cred.n_emails" =!= 0 || $"cred.n_ipv4" =!= 0)
      .count() === 0)
    // consistent: counts == 0 in ALL classes ⟺ redaction is identity
    assert(checked.filter(
      ($"c.n_urls" === 0 && $"c.n_emails" === 0 && $"c.n_ipv4" === 0) =!=
        ($"red" === $"text")).count() === 0)
    // the corpus actually exercises both sides of the biconditional
    assert(checked.filter($"red" =!= $"text").count() > 0)
    assert(checked.filter($"red" === $"text").count() > 0)
  }

  test("graft_dot native == HOF on random vectors with extreme magnitudes") {
    val vecs = (0 until 200).map { i =>
      val dim = 1 + rnd.nextInt(96)
      val scale = math.pow(10, rnd.nextInt(13) - 6)
      (i.toLong, Seq.fill(dim)(((rnd.nextDouble() * 2 - 1) * scale).toFloat))
    }.toDF("vec_id", "embedding")
    val both = vecs.select(
      dot(asDouble($"embedding"), asDouble($"embedding")).as("native"),
      dotHof(asDouble($"embedding"), asDouble($"embedding")).as("hof"))
    // bit-identical, not approximately equal
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("graft_bloom_probe matches driver-side truth under forced codegen") {
    import org.apache.spark.sql.GraftColumnBridge
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rng = new scala.util.Random(64L)
      val present = Seq.fill(200)(rng.nextLong())
      val filter = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
      present.foreach(filter.putLong)
      val bc = spark.sparkContext.broadcast(filter)
      def probe(c: org.apache.spark.sql.Column) =
        GraftColumnBridge.column(graft.expressions.BloomProbe(bc,
          GraftColumnBridge.expression(c)))
      val absent = Seq.fill(200)(rng.nextLong())
      val rows = (present ++ absent).toDF("h")
        .select($"h", probe($"h").as("p")).collect()
      rows.foreach { r =>
        assert(r.getBoolean(1) == filter.mightContainLong(r.getLong(0)),
          s"probe diverged from the filter at ${r.getLong(0)}")
      }
      // no false negatives on inserted values, by construction
      assert(rows.take(200).forall(_.getBoolean(1)))
      // null probe → null; null broadcast payload (empty index) → null
      val nulls = Seq(Option.empty[java.lang.Long]).toDF("h")
        .select(probe($"h").as("p")).collect()
      assert(nulls.head.isNullAt(0))
      val bcNull = spark.sparkContext.broadcast(
        null.asInstanceOf[org.apache.spark.util.sketch.BloomFilter])
      val np = present.take(3).toDF("h")
        .select(GraftColumnBridge.column(graft.expressions.BloomProbe(bcNull,
          GraftColumnBridge.expression($"h"))).as("p")).collect()
      assert(np.forall(_.isNullAt(0)))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}

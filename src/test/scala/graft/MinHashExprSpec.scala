package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps._

/** Native [[graft.expressions.MinHashSignature]] vs the HOF
  * transform/array_min reference: bit-identical signatures on the
  * organic corpus (the same XXH64 kernel and two-child seed fold), SQL
  * resolution, and whole-stage codegen presence.
  */
class MinHashExprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def shingled = Tables.load(spark, sf0001, "documents")
    .withColumn("toks", tokens($"text"))
    .filter(size($"toks") >= 3)
    .select($"doc_id", array_distinct(shingles($"toks", 3)).as("sh"))

  test("native signature is bit-identical to the HOF form on the corpus") {
    val both = shingled.select(
      minhashSignatureNative($"sh", 32).as("native"),
      minhashSignature($"sh", 32).as("hof"))
    assert(both.filter(to_json($"native") =!= to_json($"hof")).count() === 0)
    assert(both.filter(size($"native") =!= 32).count() === 0)
  }

  test("band keys equal the XXH64 long-fold of the signature's band slices") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val (numHashes, bands) = (32, 8)
    val rows = numHashes / bands
    val collected = shingled.limit(200).select(
      minhashSignatureNative($"sh", numHashes).as("sig"),
      minhashBandKeysNative($"sh", numHashes, bands).as("bk")).collect()
    assert(collected.nonEmpty)
    collected.foreach { r =>
      val sig = r.getSeq[Long](0)
      val bk = r.getSeq[Long](1)
      assert(bk.length === bands)
      (0 until bands).foreach { b =>
        var h = b.toLong
        (b * rows until (b + 1) * rows).foreach(j => h = XXH64.hashLong(sig(j), h))
        assert(bk(b) === h, s"band $b key drifted from the signature fold")
      }
    }
  }

  test("graft_minhash_band_keys resolves in SQL and matches the DataFrame path") {
    GraftExtensions.register(spark)
    shingled.limit(50).createOrReplaceTempView("docs_bandkeys_test")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash_band_keys(sh, 32, 8) AS bk FROM docs_bandkeys_test")
    val viaDf = shingled.limit(50)
      .select($"doc_id", minhashBandKeysNative($"sh", 32, 8).as("bk"))
    assert(viaSql.exceptAll(viaDf).count() === 0)
    assert(viaDf.exceptAll(viaSql).count() === 0)
  }

  test("graft_minhash resolves in SQL and matches the DataFrame path") {
    GraftExtensions.register(spark)
    shingled.limit(50).createOrReplaceTempView("docs_minhash_test")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash(sh, 16) AS sig FROM docs_minhash_test")
    val viaDf = shingled.limit(50)
      .select($"doc_id", minhashSignatureNative($"sh", 16).as("sig"))
    assert(viaSql.exceptAll(viaDf).count() === 0)
    assert(viaDf.exceptAll(viaSql).count() === 0)
  }

  test("null array is null; empty shingle array is null (documented)") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a b c', 'b c d')),
        |  (cast(null as array<string>)),
        |  (array()) AS t(sh)""".stripMargin)
    val rows = df.select(minhashSignatureNative($"sh", 8).as("sig")).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("native minhash stays inside whole-stage codegen") {
    val df = shingled.select($"doc_id",
      minhashSignatureNative($"sh", 32).as("sig"))
      .filter(size($"sig") === 32)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_minhash") && plan.contains("*("),
      s"expected graft_minhash in a whole-stage-codegen stage:\n$plan")
  }
}

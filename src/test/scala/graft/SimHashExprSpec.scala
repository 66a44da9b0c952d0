package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps._

/** Native [[graft.expressions.SimHashPacked]] vs the HOF
  * votes-then-pack reference form: bit-identical fingerprints on the
  * organic corpus (both hash variants and band widths), agreeing edge
  * cases, SQL resolution, and proof the native form stays inside
  * whole-stage codegen.
  */
class SimHashExprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf0001, "documents")

  private def hofFingerprint(toks: org.apache.spark.sql.Column, bits: Int,
      tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    simhashPack(simhashVotes(toks, bits, tokenHash), bits)

  test("native fingerprint is bit-identical to votes+pack on the corpus (xxhash64, 64 bits)") {
    val both = docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") > 0)
      .select(
        simhashPacked($"toks", 64).as("native"),
        hofFingerprint($"toks", 64, xxhash64(_)).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("native fingerprint matches the md5-60-bit portable variant (q22's path)") {
    val both = docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") > 0)
      .select(
        simhashPacked($"toks", 60, "md5_60").as("native"),
        hofFingerprint($"toks", 60, md5Hash60).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("edge cases: empty array is 0; null array is null natively (HOF artifact 0)") {
    val df = Seq(
      (1L, Some("a b a c")),
      (2L, Some("")),   // split("") -> [""] (one token), still defined
      (3L, None)
    ).toDF("id", "text")
      .withColumn("toks",
        when($"text".isNotNull, tokens($"text")))
    val rows = df.select(
      simhashPacked($"toks", 64).as("native"),
      hofFingerprint($"toks", 64, xxhash64(_)).as("hof")).collect()
    // defined inputs: identical
    Seq(0, 1).foreach { i =>
      assert(!rows(i).isNullAt(0) && rows(i).getLong(0) === rows(i).getLong(1))
    }
    // NULL array: native is null-in-null-out (standard SQL); the HOF twin
    // collapses to 0 because `when(null > 0).otherwise(0)` swallows the
    // null per bit — an artifact, unreachable through simhashFingerprints
    // (text is non-null, size(toks) > 0 filtered)
    assert(rows(2).isNullAt(0) && rows(2).getLong(1) === 0L)
    // genuinely empty array -> all-zero votes -> fingerprint 0
    val empty = spark.sql("SELECT array() ").toDF("raw")
      .select(simhashPacked(expr("cast(raw as array<string>)"), 64).as("fp"))
      .head()
    assert(empty.getLong(0) === 0L)
  }

  test("graft_simhash resolves in SQL and matches the DataFrame path") {
    GraftExtensions.register(spark)
    docs.limit(50).createOrReplaceTempView("docs_simhash_test")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(transform(split(text, ' '), w -> xxhash64(w))) AS fp
        |FROM docs_simhash_test WHERE size(split(text, ' ')) > 0""".stripMargin)
    val viaDf = docs.limit(50)
      .withColumn("toks", tokens($"text")).filter(size($"toks") > 0)
      .select($"doc_id", simhashPacked($"toks", 64).as("fp"))
    assert(viaSql.exceptAll(viaDf).count() === 0)
    assert(viaDf.exceptAll(viaSql).count() === 0)
  }

  test("native simhash stays inside whole-stage codegen") {
    val df = docs
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") > 0)
      .select(simhashPacked($"toks", 64).as("fp"))
      .filter($"fp" =!= 0L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_simhash") && plan.contains("*("),
      s"expected graft_simhash inside a whole-stage-codegen stage:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.RelationalQueries
import graft.operators.Joins

/** The authored 100-TB levers: HLL distinct-count variants (SURVEY A2)
  * and skew-salting (SURVEY §7.2 slice 5). Correctness here means
  * "equals the exact operator within its declared tolerance" — the
  * operators exist precisely to trade exactness for scale headroom.
  */
class ScaleOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q02 HLL variant tracks exact distinct counts within 3×rsd") {
    val exact = RelationalQueries.q02TypeRollup(spark, sf0001)
      .select($"type_name", $"studies".as("exact")).as[(String, Long)]
      .collect().toMap
    val approx = RelationalQueries.q02TypeRollupApprox(spark, sf0001, rsd = 0.05)
      .select($"type_name", $"studies".as("est")).as[(String, Long)]
      .collect().toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, est) =>
      val e = exact(k).toDouble
      assert(math.abs(est - e) / e <= 0.15,
        s"$k: estimate $est vs exact $e beyond 3×rsd")
    }
  }

  test("q08 HLL variant tracks exact distinct counts within 3×rsd") {
    val exact = RelationalQueries.q08Cooccurrence(spark, sf0001)
      .select(concat_ws("|", $"p_brand", $"n_name"), $"studies")
      .as[(String, Long)].collect().toMap
    val approx = RelationalQueries.q08CooccurrenceApprox(spark, sf0001, rsd = 0.05)
      .select(concat_ws("|", $"p_brand", $"n_name"), $"studies")
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, est) =>
      val e = exact(k).toDouble
      assert(math.abs(est - e) / e <= 0.15,
        s"$k: estimate $est vs exact $e beyond 3×rsd")
    }
  }

  test("q06's salted opt-in returns exactly the plain q06 result") {
    val plain = RelationalQueries.q06StarFeatures(spark, sf0001)
    val salted = RelationalQueries.q06StarFeaturesSalted(spark, sf0001, salt = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val fact = spark.range(5000).select(
      (when($"id" % 10 === 0, 1L).otherwise($"id" % 100)).as("k"),
      $"id".as("payload"))
    val dim = spark.range(100).select($"id".as("k"),
      concat(lit("dim"), $"id").as("name"))
    val plain = fact.join(dim, "k").select($"k", $"payload", $"name")
    val salted = Joins.saltedJoin(fact, dim, "k", salt = 8)
      .select($"k", $"payload", $"name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a planted hot key across shuffle partitions") {
    // 90% of fact rows share key 1 → unsalted, they join in ONE shuffle
    // partition; salted, the hot key's rows spread over up to `salt`
    // (key, salt) sub-keys.
    val fact = spark.range(20000).select(
      when($"id" % 10 =!= 0, 1L).otherwise($"id" % 50).as("k"),
      $"id".as("payload"))
    val dim = spark.range(50).select($"id".as("k"), lit("d").as("name"))

    def hotSpread(df: org.apache.spark.sql.DataFrame): Long =
      df.filter($"k" === 1)
        .select(spark_partition_id().as("pid")).distinct().count()

    // AQE coalescing would re-merge these tiny test partitions and hide
    // the distribution under measurement; at real scale partitions don't
    // coalesce away. shuffle_hash hint keeps the dim off the broadcast
    // path for the same reason.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val unsalted = fact.join(dim.hint("shuffle_hash"), "k")
      val salted = Joins.saltedJoin(fact, dim.hint("shuffle_hash"), "k", salt = 8)
      val before = hotSpread(unsalted)
      val after = hotSpread(salted)
      assert(before === 1L, s"unsalted hot key unexpectedly spread: $before")
      assert(after > 1L, s"salting failed to spread the hot key: $after")
    } finally
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps._

/** Native [[graft.expressions.ArrayDotProduct]] vs the higher-order
  * `aggregate(zip_with(...))` reference form: bit-identical values on
  * real embeddings, identical NULL semantics on the edge cases, SQL
  * resolution through the extensions registration, and proof the
  * native form stays inside whole-stage codegen.
  */
class VectorExprSpec extends AnyFunSuite with SparkSpec {

  private def emb = Tables.load(spark, sf0001, "embeddings")

  test("native dot is bit-identical to the higher-order form on real embeddings") {
    import spark.implicits._
    val both = emb.select(
      dot(asDouble($"embedding"), asDouble($"embedding")).as("native"),
      dotHof(asDouble($"embedding"), asDouble($"embedding")).as("hof"))
    // bit-identical, not approximately-equal: summation order matches
    assert(both.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() === 0)
  }

  test("null and length-mismatch semantics mirror zip_with/aggregate") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))),        // length mismatch -> null
      (None, Some(Seq(1.0)))                        // null array -> null
    ).toDF("a", "b")
    val rows = df.select(dot($"a", $"b").as("n"), dotHof($"a", $"b").as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))

    // null ELEMENT propagates to null on both paths
    val withNullElem = spark.sql(
      "SELECT array(1.0d, cast(null as double)) a, array(2.0d, 3.0d) b")
    val r2 = withNullElem.select(dot($"a", $"b"), dotHof($"a", $"b")).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("graft_dot resolves in SQL after registration and matches the DataFrame path") {
    GraftExtensions.register(spark)
    emb.limit(50).createOrReplaceTempView("emb_expr_test")
    val viaSql = spark.sql(
      """SELECT vec_id, graft_dot(transform(embedding, x -> cast(x as double)),
        |                         transform(embedding, x -> cast(x as double))) AS d
        |FROM emb_expr_test""".stripMargin)
    import spark.implicits._
    val viaDf = emb.limit(50).select($"vec_id",
      dot(asDouble($"embedding"), asDouble($"embedding")).as("d"))
    assert(viaSql.exceptAll(viaDf).count() === 0)
    assert(viaDf.exceptAll(viaSql).count() === 0)
  }

  test("spark.sql.extensions injection registers graft functions without register()") {
    // SparkSpec's session carries
    // spark.sql.extensions=graft.GraftExtensions (the cluster deployment
    // mechanism; a static conf, so it rides the first session of the
    // JVM) — every graft_* function must resolve with NO manual
    // GraftExtensions.register() call
    val d = spark.newSession().sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d," +
        " graft_simhash(array(7L), 64) AS s," +
        " graft_minhash(array('a b'), 4) AS m")
      .head()
    assert(d.getDouble(0) === 11.0)
    assert(!d.isNullAt(1) && d.getAs[Seq[Long]](2).size === 4)
  }

  test("native dot stays inside whole-stage codegen") {
    import spark.implicits._
    val df = emb.select(dot(asDouble($"embedding"), asDouble($"embedding")).as("d"))
      .filter($"d" > 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as `*(n) Project/Filter ...` in the plan string
    assert(plan.contains("*(1) Project [graft_dot"),
      s"expected graft_dot inside a whole-stage-codegen Project:\n$plan")
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The bounded-heap top-k aggregate ([[graft.expressions.TopKByScore]])
  * that replaced the `row_number` window in every similarity route:
  * row-for-row equality with the window form (including ties), heap
  * edge cases, and the SQL function surface.
  */
class TopKSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** The window form the aggregate replaced — kept here as the
    * reference semantics. */
  private def windowTopK(cands: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy($"q").orderBy($"sim".desc, $"c".asc)
    cands.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .select($"q", $"c".as("neighbor_id"), $"sim", $"rn")
  }

  private def aggTopK(cands: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val agg = GraftColumnBridge.column(graft.expressions.TopKByScore(
      GraftColumnBridge.expression($"sim"),
      GraftColumnBridge.expression($"c"), k).toAggregateExpression())
    cands.filter($"sim".isNotNull).groupBy($"q").agg(agg.as("tk"))
      .select($"q", posexplode($"tk"))
      .select($"q", $"col.id".as("neighbor_id"), $"col.sim".as("sim"),
        ($"pos" + 1).cast("int").as("rn"))
  }

  test("heap aggregate equals the window form on dense ties and sparse groups") {
    // seeded candidates: few distinct scores (ties everywhere), some
    // groups smaller than k, some much larger
    val rng = new scala.util.Random(42)
    val cands = (1 to 5000).map { i =>
      (rng.nextInt(40).toLong, i.toLong, (rng.nextInt(7) / 10.0))
    }.toDF("q", "c", "sim")
    for (k <- Seq(1, 3, 10)) {
      val w = windowTopK(cands, k).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val h = aggTopK(cands, k).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(h == w, s"k=$k: heap diverged from window " +
        s"(${h.size} vs ${w.size} rows)")
    }
  }

  test("brute-force top-k (heap route) equals the window form on real embeddings") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val got = Similarity.bruteForceTopK(emb, $"vec_id" < 20, k = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // reference: the same candidate relation ranked by the window
    val prepared = emb.select($"vec_id",
      $"embedding".cast("array<double>").as("v"))
    val queries = prepared.filter($"vec_id" < 20)
      .select($"vec_id".as("q"), $"v".as("qv"))
    val cands = prepared.join(broadcast(queries), $"vec_id" =!= $"q")
      .withColumn("sim", graft.functions.VectorOps.roundedSim(
        graft.functions.VectorOps.cosine($"qv", $"v",
          graft.functions.VectorOps.l2Norm($"qv"),
          graft.functions.VectorOps.l2Norm($"v"))))
      .select($"q", $"vec_id".as("c"), $"sim")
    val want = windowTopK(cands, 10).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want)
  }

  test("heap edge cases: k > group size, ties to lower id, null scores dropped") {
    val cands = Seq(
      (1L, 10L, Some(0.5)), (1L, 11L, Some(0.5)), (1L, 12L, Some(0.9)),
      (1L, 13L, None), // null sim: non-comparable, dropped
      (2L, 20L, Some(0.1))
    ).toDF("q", "c", "sim")
    val got = aggTopK(cands, 5).orderBy($"q", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(got == Seq((1L, 12L, 1), (1L, 10L, 2), (1L, 11L, 3), (2L, 20L, 1)),
      s"got $got")
  }

  test("NaN scores never enter the heap: zero-norm embeddings degrade nothing") {
    // NaN is the nasty twin of the null case: cosine over a zero-norm
    // vector is 0/0 = NaN (NOT null), worse() is false for every NaN
    // comparison, so a NaN at the heap's min-root could never be
    // displaced — the group's top-k silently froze at the first k rows
    // scanned. Contract: NaN = non-comparable, dropped like null.
    // Scatter NaNs THROUGH a big group so some land among the first k
    // scanned (the freeze trigger), then compare to the window form
    // over the NaN-free relation.
    val rng = new scala.util.Random(11)
    val cands = (1 to 4000).map { i =>
      val sim = if (i % 7 == 0) Double.NaN else rng.nextInt(50) / 100.0
      (rng.nextInt(20).toLong, i.toLong, sim)
    }.toDF("q", "c", "sim")
    val got = aggTopK(cands, 10).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = windowTopK(cands.filter(!isnan($"sim")), 10).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want, "NaN candidates must drop, not poison the heap")
    assert(!got.exists(_._3.isNaN))
    // end-to-end: an all-zero embedding in the corpus produces NaN sims
    // against every query; brute-force top-k must rank as if it were
    // absent from the candidate side (it stays a query — of nothing
    // comparable — and surfaces no rows as one)
    val base = Tables.load(spark, sf0001, "embeddings").limit(50)
    val dim = base.select(size($"embedding")).head().getInt(0)
    val zeroed = base.unionByName(
      Seq((999999L, Array.fill(dim)(0.0f), 0))
        .toDF("vec_id", "embedding", "label"))
    val gotZ = Similarity.bruteForceTopK(zeroed, $"vec_id" < 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantZ = Similarity.bruteForceTopK(base, $"vec_id" < 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotZ == wantZ,
      "a zero-norm corpus vector must not perturb anyone's top-k")
  }

  test("graft_topk resolves in SQL and matches the DataFrame route") {
    val rng = new scala.util.Random(7)
    (1 to 1000).map { i =>
      (rng.nextInt(10).toLong, i.toLong, rng.nextInt(100) / 100.0)
    }.toDF("q", "c", "sim").createOrReplaceTempView("topk_cands")
    val viaSql = spark.sql(
      """SELECT q, tk.id AS neighbor_id, tk.sim AS sim
        |FROM (SELECT q, graft_topk(sim, c, 4) AS tks FROM topk_cands GROUP BY q)
        |LATERAL VIEW explode(tks) AS tk""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaDf = aggTopK(spark.table("topk_cands"), 4)
      .select($"q", $"neighbor_id", $"sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSql == viaDf)
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup}

/** Pins [[Curation.selectUnderTokenBudget]] to the naive one-global-
  * window form its scaladoc (and q73's DuckDB oracle) promises
  * equivalence to, exercises the budget boundary inside a score group
  * (including exact-fit and zero-budget edges), and pins
  * [[Dedup.keepByPriority]]'s tie / constant-priority / missing-
  * priority contracts.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents").cache()

  /** The naive reference form: ONE global window over every document —
    * correct at any scale the window fits, and the shape the operator's
    * bounded-rollup plan must agree with row-for-row. */
  private def naiveSelect(scored: DataFrame, budget: Column): DataFrame = {
    val w = Window.orderBy($"quality_score".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.withColumn("_cum", sum($"token_count").over(w))
      .filter($"_cum" <= budget)
      .drop("_cum")
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select($"doc_id").collect().map(_.getLong(0)).toSet

  // score groups (0.9: docs 1,2 → 30 tokens), (0.5: docs 3,4,5 →
  // 112 tokens), (0.1: doc 6 → 3 tokens); budgets below cut INSIDE the
  // middle group so the boundary-score window path is exercised
  private lazy val fixture = Seq(
    (1L, "a", 10L, 0.9), (2L, "a", 20L, 0.9),
    (3L, "b", 5L, 0.5), (4L, "a", 7L, 0.5), (5L, "b", 100L, 0.5),
    (6L, "b", 3L, 0.1)
  ).toDF("doc_id", "source", "token_count", "quality_score")

  test("budget boundary splits a score group exactly like the naive window") {
    // 42 keeps the 0.9 group whole and docs 3,4 of the boundary group
    assert(ids(Curation.selectUnderTokenBudget(fixture, lit(42L)))
      == Set(1L, 2L, 3L, 4L))
    // 40 drops doc 4 (running 30+5+7=42 > 40) but keeps doc 3
    assert(ids(Curation.selectUnderTokenBudget(fixture, lit(40L)))
      == Set(1L, 2L, 3L))
    for (b <- Seq(0L, 5L, 29L, 30L, 35L, 40L, 42L, 141L, 142L, 145L, 1000L)) {
      assert(ids(Curation.selectUnderTokenBudget(fixture, lit(b)))
        == ids(naiveSelect(fixture, lit(b))), s"budget $b diverged")
    }
  }

  test("exact-fit budget keeps exactly the fitting prefix") {
    // 30 = the 0.9 group exactly; the 0.5 group becomes the boundary
    // score but its first doc (35 > 30) already overflows
    assert(ids(Curation.selectUnderTokenBudget(fixture, lit(30L)))
      == Set(1L, 2L))
    // 145 = the whole corpus exactly
    assert(ids(Curation.selectUnderTokenBudget(fixture, lit(145L)))
      == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("zero budget keeps nothing; oversized budget keeps everything") {
    assert(Curation.selectUnderTokenBudget(fixture, lit(0L)).count() == 0L)
    assert(ids(Curation.selectUnderTokenBudget(fixture, lit(Long.MaxValue)))
      == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("operator == naive window on a dense-collision corpus with a scalar budget") {
    // hash-derived scores over 1000 buckets force duplicate rounded
    // scores (the boundary group is usually multi-doc), and the budget
    // enters as a scalar subquery exactly as q73 builds it
    val scored = docs.select(
      $"doc_id", $"source",
      (pmod(xxhash64($"doc_id"), lit(97)) + 1).cast("long").as("token_count"),
      round(pmod(xxhash64($"doc_id" * 31), lit(1000)).cast("double") / 1000.0, 4)
        .as("quality_score")).cache()
    val budget = scored.agg(expr("sum(token_count) DIV 2")).scalar()
    val got = Curation.selectUnderTokenBudget(scored, budget)
    val want = naiveSelect(scored, budget)
    assert(got.count() > 0L, "degenerate fixture: nothing selected")
    assert(ids(got) == ids(want))
    // full-row equality, not just the id set
    assert(got.exceptAll(want).count() == 0L && want.exceptAll(got).count() == 0L)
  }

  test("empty and all-filtered input: NULL budget drops every row, no throw") {
    // sum() over zero rows is NULL; cum <= NULL is three-valued false —
    // the CONTRACT is empty-in → empty-out even when the budget is a
    // scalar subquery over the same empty frame
    val empty = fixture.filter($"doc_id" < 0L)
    val nullBudget = empty.agg(expr("sum(token_count) DIV 2")).scalar()
    assert(Curation.selectUnderTokenBudget(empty, nullBudget).count() == 0L)
    assert(Curation.selectUnderTokenBudget(empty, lit(100L)).count() == 0L)
    // non-empty corpus but a NULL budget: nothing passes (not a crash)
    assert(Curation.selectUnderTokenBudget(fixture, nullBudget).count() == 0L)
  }

  test("keepByPriority with constant priority == dedupClusters min-id keeps") {
    val pairs = Dedup.ngramJaccard(docs, k = 5, threshold = 0.4)
      .select($"doc_a", $"doc_b").cache()
    assert(pairs.count() > 0L)
    val const = docs.select($"doc_id", lit(1.0).as("priority"))
    val got = Dedup.keepByPriority(pairs, const)
    val want = Dedup.dedupClusters(pairs)
    // same membership, same components, and — with ties broken to the
    // lower doc_id — the identical keep set
    assert(got.exceptAll(want).count() == 0L && want.exceptAll(got).count() == 0L)
  }

  test("keepByPriority keeps the best copy; ties break to the lower doc_id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val prio = Seq((1L, 1.0), (2L, 5.0), (3L, 5.0), (10L, 1.0), (11L, 9.0))
      .toDF("doc_id", "priority")
    val out = Dedup.keepByPriority(pairs, prio).cache()
    val keeps = out.filter($"is_keep").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keeps == Set(2L, 11L)) // 2 beats 3 on the tie; 11 outranks 10
    assert(out.count() == 5L)
    // exactly one keep per component
    val perComp = out.groupBy($"component")
      .agg(sum(when($"is_keep", 1).otherwise(0)).as("n"))
    assert(perComp.filter($"n" =!= 1).count() == 0L)
  }

  test("keepByPriority drops cluster members with no priority row") {
    // the inner join is the contract: an unscored member cannot be
    // ranked, so it leaves the report (mirrors the q53/q19 drop rule)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val prio = Seq((1L, 1.0), (2L, 5.0)).toDF("doc_id", "priority")
    val out = Dedup.keepByPriority(pairs, prio)
    assert(out.select($"doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(out.filter($"is_keep").select($"doc_id")
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("composition: one pair relation feeds clusters, quality keep, and leakage audit") {
    // The declared queries q42/q74/q72 are each self-contained (the
    // oracle harness runs them independently), so each re-derives q20's
    // Jaccard pair relation. A production composition computes the
    // pairs ONCE inside a CacheScope and fans out — this is the adopter
    // example SURVEY §2.12 documents, pinned equal to all three
    // declared results.
    import graft.functions.TextOps.{md5Hash60, stopwordCount, tokens, uniqueRatio}
    import graft.jobs.DocumentQueries
    import graft.operators.CacheScope

    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    val (gotClusters, gotKeep, gotLeak) = CacheScope.withCachesReleased {
      // computed once, persisted for its three consumers; released the
      // moment the scope closes
      val pairs = CacheScope.persist(Dedup.ngramJaccard(
        docs.select($"doc_id", $"text"), k = 5, threshold = 0.4,
        maxDF = DocumentQueries.maxShingleDF).select($"doc_a", $"doc_b"))
      val d = docs.withColumn("toks", tokens($"text"))
        .filter(size($"toks") > 0)
      val priority = d.select($"doc_id",
        round(((lit(1.0) - stopwordCount($"toks", DocumentQueries.stopwords)
          .cast("double") / size($"toks"))
          + uniqueRatio($"toks")
          + least(size($"toks").cast("double") / 50.0, lit(1.0))) / 3.0, 4)
          .as("priority"))
      val bucket = md5Hash60($"doc_id".cast("string")) % 100
      val splits = docs.select($"doc_id",
        when(bucket < 80, "train").when(bucket < 90, "validate")
          .otherwise("test").as("split"))
      (rows(Dedup.dedupClusters(pairs)),
        rows(Dedup.keepByPriority(pairs, priority)),
        rows(Dedup.splitLeakage(pairs, splits)))
    }
    assert(gotClusters ==
      rows(DocumentQueries.queries("q42_dedup_clusters")(spark, sf0001)))
    assert(gotKeep ==
      rows(DocumentQueries.queries("q74_quality_keep")(spark, sf0001)))
    assert(gotLeak ==
      rows(DocumentQueries.queries("q72_split_leakage")(spark, sf0001)))
  }

  test("declared q75 pipeline equals the q42/q74/q72 trio stage-for-stage") {
    // the composition above, promoted to a DECLARED query (one pair
    // relation, one components frame, three stacked reports): each
    // stage slice must be row-identical to its self-contained declared
    // twin, so the driver's oracle check on q75 transitively re-proves
    // the trio — and its bench entry measures the compose-once cost
    import graft.jobs.DocumentQueries
    def rows(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet
    val q75 = DocumentQueries.queries("q75_curation_pipeline")(spark, sf0001)
      .cache()
    def stage(s: String, cols: String*): Set[Seq[Any]] =
      rows(q75.filter($"stage" === s).select(cols.map(col): _*))
    // is_keep rides as INT 0/1 in the stacked report (null-free object
    // columns — see the query's padding discipline); decode for the
    // row-identity check against the boolean-shaped twins
    def keepDecoded(s: String): Set[Seq[Any]] =
      rows(q75.filter($"stage" === s)
        .select($"doc_id", $"component", ($"is_keep" === 1).as("is_keep")))
    try {
      assert(keepDecoded("clusters") ==
        rows(DocumentQueries.queries("q42_dedup_clusters")(spark, sf0001)))
      assert(keepDecoded("quality_keep") ==
        rows(DocumentQueries.queries("q74_quality_keep")(spark, sf0001)))
      assert(stage("leakage", "component", "n_docs", "n_splits", "splits") ==
        rows(DocumentQueries.queries("q72_split_leakage")(spark, sf0001)))
      // the padding columns are null (or '' for splits) outside their stage
      assert(q75.filter($"stage" =!= "leakage" &&
        ($"n_docs".isNotNull || $"n_splits".isNotNull || $"splits" =!= ""))
        .count() == 0L)
      assert(q75.filter($"stage" === "leakage" &&
        ($"doc_id".isNotNull || $"is_keep".isNotNull)).count() == 0L)
    } finally q75.unpersist()
  }
}

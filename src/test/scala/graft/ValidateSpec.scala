package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.{DocumentQueries, EventQueries}
import graft.operators.Validate
import graft.operators.Validate.{Check, fraction, ratio}

/** The data-quality gate (q67 / `Validate.report`) and the ingest-rate
  * anomaly screen (q68 / `EventQueries.hourlyAnomaly`) — the two
  * pipeline-monitoring stations. Violations must be DETECTED (a gate
  * that always passes is worse than none), verdict values must be the
  * exact integer-derived numbers the doc-comments promise, and both
  * operators must be invariant to input partitioning.
  */
class ValidateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ Validate

  private def docsFrame(rows: Seq[(Long, String, String, String, Long)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val checks = Seq(
    Check("row_count", count(lit(1)), _ > 0.0),
    Check("doc_id_unique",
      fraction(countDistinct($"doc_id"), count(lit(1))),
      _ === 1.0),
    Check("text_nonempty", ratio($"text".isNotNull && length($"text") > 0),
      _ >= 0.99),
    Check("n_chars_consistent", ratio($"n_chars" === length($"text")),
      _ === 1.0))

  test("report flags each violation with the exact offending value") {
    // 4 rows: one duplicated id, one null text, one wrong n_chars
    val bad = docsFrame(Seq(
      (1L, "good text", "en", "s0", 9L),
      (1L, "dup id", "en", "s0", 6L),
      (2L, null, "en", "s0", 0L),
      (3L, "short", "en", "s0", 99L)))
    val got = Validate.report(bad, checks)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(got("row_count") == ((4.0, true)))
    assert(got("doc_id_unique") == ((3.0 / 4.0, false)))
    assert(got("text_nonempty") == ((3.0 / 4.0, false)))
    // null text: n_chars(0) === length(null) is null → not counted as
    // consistent; wrong n_chars row also inconsistent → 2/4
    assert(got("n_chars_consistent") == ((2.0 / 4.0, false)))
  }

  test("report on an empty frame: nothing passes, nothing throws") {
    val got = Validate.report(docsFrame(Seq.empty), checks)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(got.size == 4 && got.values.forall(_ == false),
      "a gate must not promote what it cannot measure")
  }

  test("the whole suite is ONE pass: a single scan of the input") {
    val plan = Validate.report(docsFrame(Seq((1L, "t", "en", "s0", 1L))),
      checks).queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan of the validated frame, got $scans:\n$plan")
  }

  test("duplicate check names are rejected") {
    intercept[IllegalArgumentException] {
      Validate.report(docsFrame(Seq.empty),
        Seq(Check("a", count(lit(1)), _ > 0.0), Check("a", count(lit(1)), _ > 0.0)))
    }
  }

  test("q67 on the fixture corpus: every expectation passes") {
    val rows = DocumentQueries.q67QualityGate(spark, sf0001).collect()
    assert(rows.length == 7)
    assert(rows.forall(_.getBoolean(2)),
      s"fixture corpus should satisfy the gate: ${rows.mkString("; ")}")
  }

  // ------------------------------------------- referentialCoverage (q71)

  test("referential coverage: covered/missing/orphan tallied exactly") {
    val facts = Seq((1L, "s0"), (2L, "s0"), (3L, "s1"), (4L, "s1"))
      .toDF("doc_id", "source")
    // 1,3 covered; 2,4 missing; 9 orphan — and ref key 1 is DOUBLE-loaded,
    // which must neither fan doc 1 out nor count coverage twice
    val refs = Seq(1L, 1L, 3L, 9L).toDF("vec_id")
    val got = Validate
      .referentialCoverage(facts, refs, "doc_id", "vec_id", Seq("source"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .toMap
    assert(got == Map(
      Some("s0") -> ((2L, 1L, 1L, 0L, Some(0.5))),
      Some("s1") -> ((2L, 1L, 1L, 0L, Some(0.5))),
      // orphans carry no fact-side source → the null-group row
      None -> ((0L, 0L, 0L, 1L, None))))
  }

  test("referential coverage: empty sides and the global (ungrouped) form") {
    val facts = Seq((1L, "s0"), (2L, "s0")).toDF("doc_id", "source")
    val refs = Seq(1L).toDF("vec_id")
    // no groupCols → one global row
    val global = Validate
      .referentialCoverage(facts, refs, "doc_id", "vec_id").collect()
    assert(global.length == 1)
    assert((global(0).getLong(0), global(0).getLong(1), global(0).getLong(2),
      global(0).getLong(3)) == ((2L, 1L, 1L, 0L)))
    // empty ref side: everything missing, coverage 0, no orphans
    val noRefs = Validate.referentialCoverage(
      facts, refs.limit(0), "doc_id", "vec_id").collect()(0)
    assert((noRefs.getLong(1), noRefs.getLong(2), noRefs.getDouble(4)) ==
      ((0L, 2L, 0.0)))
    // empty fact side: only orphans, coverage null (nothing to measure)
    val noFacts = Validate.referentialCoverage(
      facts.limit(0), refs, "doc_id", "vec_id").collect()(0)
    assert((noFacts.getLong(0), noFacts.getLong(3)) == ((0L, 1L)))
    assert(noFacts.isNullAt(4), "coverage of zero facts must be null")
  }

  test("referential coverage is invariant to input partitioning") {
    val facts = (0L until 100L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val refs = (0L until 120L by 2L).toDF("vec_id")
    def run(fp: Int, rp: Int) = Validate
      .referentialCoverage(facts.repartition(fp), refs.repartition(rp),
        "doc_id", "vec_id", Seq("source"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(run(1, 1).sameElements(run(7, 5)))
  }

  // ------------------------------------------------------- hourlyAnomaly

  /** Events at `perHour(h)` events in hour h since the base instant. */
  private def eventsAt(perHour: Map[Int, Int]) = {
    val rows = for {
      (h, n) <- perHour.toSeq
      i <- 0 until n
    } yield (h.toLong * 3600 + i, 1L)
    rows.toDF("s", "user_id")
      .select(expr("timestampadd(SECOND, s, TIMESTAMP_NTZ '2024-03-01 00:00:00')")
        .as("ts"))
  }

  // 10,11,12 repeating baseline (non-zero variance), spike at 48, drop at
  // 75 — far enough apart that the spike has aged OUT of the drop's
  // trailing window (an extreme outlier inside the baseline inflates the
  // sample σ and masks later anomalies; that masking is inherent to a
  // mean/σ screen and the doc-comment's stated contract, not a bug)
  private val series: Map[Int, Int] =
    (0 until 86).map(h => h -> (10 + h % 3)).toMap + (48 -> 120) + (75 -> 1)

  /** Run the screen and key rows by hour RELATIVE to the series start
    * (hour_idx is absolute hours-since-epoch; hour 0 always exists in
    * the fixtures here, so min(hour_idx) is the base). */
  private def scored(perHour: Map[Int, Int])
      : Map[Long, (Long, Long, Option[Double], Boolean)] = {
    val out = EventQueries.hourlyAnomaly(eventsAt(perHour)).collect()
    val base = out.map(_.getLong(0)).min
    out.map(r => (r.getLong(0) - base) ->
      ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4))))
      .toMap
  }

  test("anomalous hours are flagged; the calm baseline is not") {
    val out = scored(series)
    val flagged = out.collect { case (h, (_, _, _, true)) => h }.toSeq.sorted
    assert(flagged == Seq(48L, 75L),
      s"expected exactly the spike and the drop, got ${flagged.mkString(",")}")
    assert(out(47L)._3.exists(z => math.abs(z) < 3.0))
    // warm-up: hours with fewer than minBaseline trailing hours get no score
    assert((0L until 12L).forall(h => out(h)._3.isEmpty && !out(h)._4))
  }

  test("the scored hour is excluded from its own baseline") {
    // hour 49's trailing window contains the 120-event spike at 48, but
    // hour 48's own z is computed against hours 24..47 only — so the
    // spike itself scores high instead of dampening itself
    assert(scored(series)(48L)._3.exists(_ > 50.0))
  }

  test("RANGE frame: gap hours age out instead of stretching the window") {
    val gappy = series -- (20 to 40) // hours 20..40 missing entirely
    val after = scored(gappy)(45L)
    // trailing 24 h of hour 45 = hours 21..44, of which only 41..44 exist
    assert(after._2 == 4, s"base_n=${after._2}")
    assert(after._3.isEmpty, "4 baseline hours < minBaseline → no score")
  }

  test("anomaly screen is invariant to input partitioning") {
    val e = eventsAt(series)
    def run(df: org.apache.spark.sql.DataFrame) =
      EventQueries.hourlyAnomaly(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
        .sortBy(_._1)
    assert(run(e.repartition(1)).sameElements(run(e.repartition(7))))
  }
}

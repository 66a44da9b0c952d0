package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.aact.AactPipeline
import graft.aact.AactPipeline.Star

/** Pins the C1/C2/C3 pipeline outputs on AACT-shaped fixtures
  * (FIXTURES.md §B) against hand-computed expectations from the
  * reference SQL (init-user-db.sh, db2wh-etl.sh, ct_data.py).
  *
  * The fixture is built to hit every subtle branch: the five-arm
  * conditional agg with NULL-skipping avg, 'Anticipated' exclusion,
  * the 8-vs-15-term site drift ('congenital anomaly'), three-valued
  * bool_or-OR logic, the non-distinct co-occurrence count, and the
  * literal-vs-rollup fan-out difference (SURVEY §7.4.4-6).
  */
class AactPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  // -- base tables -----------------------------------------------------
  // (nct_id, overall_status, phase, start_date, first_submitted,
  //  study_type, enrollment, enrollment_type, number_of_arms,
  //  number_of_groups, source, brief_title)
  private lazy val studies = Seq(
    ("N1", "Completed", "Phase 3", d("2019-06-01"), d("2018-01-01"),
      "Interventional", Some(100), "Actual", Some(2), 1, "Pfizer",
      "Stage III breast cancer trial"),
    ("N2", "Terminated", "Phase 2", d("2020-02-01"), d("2019-03-01"),
      "Interventional", Some(50), "Anticipated", Some(1), 1, "Roche",
      "Stage IV hematoma study"),
    ("N3", "Completed", "N/A", d("2019-09-01"), d("2017-05-01"),
      "Observational", Some(30), "Actual", None, 2, "NIH",
      "Observational breast cancer registry"),
    ("N4", "Withdrawn", "Phase 1", d("2020-07-01"), d("2020-01-01"),
      "Interventional", Some(20), "Actual", Some(3), 1, "Mayo",
      "Congenital anomaly repair"),
    ("N5", "Completed", "Phase 3", d("2021-01-01"), d("2020-06-01"),
      "Interventional", None, "Actual", None, 1, "Pfizer",
      "Adjuvant breast cancer follow-up"),
    ("N6", "Recruiting", "N/A", d("2021-03-01"), d("2021-02-01"),
      "Observational", Some(10), "Actual", Some(1), 1, "UCSF",
      "Advanced melanoma survey"))
    .toDF("nct_id", "overall_status", "phase", "start_date",
      "study_first_submitted_date", "study_type", "enrollment",
      "enrollment_type", "number_of_arms", "number_of_groups", "source",
      "brief_title")

  private lazy val conditions = Seq(
    ("N1", "breast cancer"), ("N1", "diabetes"),
    ("N2", "hematoma"),
    ("N3", "breast cancer"),
    ("N4", "congenital anomaly"), ("N4", "congenital anomaly"), // dup row
    ("N5", "breast cancer"))
    .toDF("nct_id", "downcase_name")

  private lazy val interventionsRaw = Seq(
    (1L, "N1", "Drug", Option("Tamoxifen")),
    (2L, "N1", "Device", Option.empty[String]),  // null name → filtered
    (3L, "N2", "Drug", Option("tamoxifen")),     // same name, lower-cased
    (4L, "N4", "Procedure", Option("Surgery")))
    .toDF("id", "nct_id", "intervention_type", "name")

  private lazy val interventions = AactPipeline.withDowncaseName(interventionsRaw)

  private lazy val sponsors = Seq(
    ("N1", "Pfizer", "Industry", "lead"),
    ("N1", "NIH", "NIH", "collaborator"),
    ("N2", "Roche", "Industry", "lead"),
    ("N4", "Mayo", "Other", "lead"))
    .toDF("nct_id", "name", "agency_class", "lead_or_collaborator")

  private lazy val designs = Seq(
    ("N1", "Randomized", "Parallel Assignment", "Treatment"),
    ("N2", "Non-Randomized", "Single Group Assignment", "Prevention"),
    ("N4", "Randomized", "Parallel Assignment", "Treatment"))
    .toDF("nct_id", "allocation", "intervention_model", "primary_purpose")

  private lazy val eligibilities = Seq(
    ("N1", "Female", "adults"), ("N2", "Male", "adults"),
    ("N4", "All", "children"))
    .toDF("nct_id", "gender", "criteria")

  private lazy val briefSummaries = Seq(
    ("N1", "a randomized study of tamoxifen"),
    ("N2", "a non-randomized safety study"),
    ("N4", "surgical repair outcomes"))
    .toDF("nct_id", "description")

  private lazy val designGroupInterventions = Seq(
    (10L, "N1"), (11L, "N1"), (12L, "N2"))
    .toDF("id", "nct_id")

  // raw calculated_values BEFORE the C1 enrichment (4 base cols)
  private lazy val calculatedValuesRaw = Seq(
    ("N1", 3, true, false), ("N2", 1, false, true), ("N3", 0, true, true),
    ("N4", 2, false, false), ("N5", 1, true, true),
    ("NCT99", 9, true, true)) // orphan: no studies row → NULL enrichment
    .toDF("nct_id", "number_of_facilities", "has_us_facility",
      "has_single_facility")

  private lazy val ccv =
    AactPipeline.conditionsCalculatedValues(conditions, studies)

  // -- C1: conditions_calculated_values -------------------------------
  test("C1 conditions_calculated_values matches hand-computed rows") {
    val got = ccv
      .select($"downcase_name", $"is_oncology",
        $"total_interventional_studies", $"completed_interventional_studies",
        $"terminated_interventional_studies",
        $"withdrawn_interventional_studies",
        $"intervention_completion_ratio", $"enrollment_avg",
        $"first_seen_date".cast("string"))
      .as[(String, Boolean, Long, Long, Long, Long, Float, Option[Float], String)]
      .collect().sortBy(_._1).toSeq
    val expected = Seq(
      // 'anoma' site-drift: NOT oncology under the 15-term list; dup
      // condition rows don't double count(distinct); avg over dup rows
      // still 20 (same value twice)
      ("congenital anomaly", false, 1L, 0L, 0L, 1L, 0f, Some(20f), "2020-01-01"),
      ("breast cancer", true, 2L, 2L, 0L, 0L, 1f, Some(100f), "2017-05-01"),
      ("diabetes", false, 1L, 1L, 0L, 0L, 1f, Some(100f), "2018-01-01"),
      // N2 is 'Anticipated' → excluded from the s_done avg → NULL
      ("hematoma", true, 1L, 0L, 1L, 0L, 0f, None, "2019-03-01"))
      .sortBy(_._1)
    assert(got == expected)
  }

  // -- C1: study enrichment + update-join ------------------------------
  test("C1 study enrichment: three-valued OR, J5 text join, counts") {
    val enr = AactPipeline.studyEnrichment(studies, designs, conditions, ccv)
    val got = enr
      .select($"nct_id", $"is_oncology", $"number_of_conditions",
        $"average_condition_completion_ratio", $"primary_purpose")
      .as[(String, Option[Boolean], Long, Option[Float], Option[String])]
      .collect().sortBy(_._1).toSeq
    val expected = Seq(
      ("N1", Some(true), 2L, Some(1f), Some("Treatment")),    // (1+1)/2
      ("N2", Some(true), 1L, Some(0f), Some("Prevention")),
      ("N3", Some(true), 1L, Some(1f), None),                 // no designs row
      // ce says false ('anoma' drift) and title has no 15-term match,
      // avg over dup condition rows still 0
      ("N4", Some(false), 1L, Some(0f), Some("Treatment")),
      ("N5", Some(true), 1L, Some(1f), None),
      // no conditions at all: bool_or(NULL)=NULL, but title 'melanoma'
      // matches 'lanoma' → NULL OR true = true
      ("N6", Some(true), 0L, None, None))
    assert(got == expected)
  }

  test("C1 update-join keeps NULL new columns for unmatched rows (J6)") {
    val enriched = AactPipeline.enrichCalculatedValues(calculatedValuesRaw,
      AactPipeline.studyEnrichment(studies, designs, conditions, ccv))
    assert(enriched.count() == 6)
    val orphan = enriched.filter($"nct_id" === "NCT99")
      .select($"is_oncology", $"number_of_conditions", $"primary_purpose")
      .collect()(0)
    assert(orphan.isNullAt(0) && orphan.isNullAt(1) && orphan.isNullAt(2))
  }

  // -- C1: interventions rollups --------------------------------------
  test("C1 interventions_calculated_values: lower-cased names merge") {
    val got = AactPipeline.interventionsCalculatedValues(interventions, studies)
      .select($"intervention_name", $"studies",
        $"first_seen_date".cast("string"), $"last_seen_date".cast("string"))
      .as[(String, Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("surgery", 1L, "2020-01-01", "2020-01-01"),
      // 'Tamoxifen' (N1) + 'tamoxifen' (N2) merge under lower()
      ("tamoxifen", 2L, "2018-01-01", "2019-03-01")))
  }

  test("C1 interventions_conditions: non-distinct fan count preserved") {
    val got = AactPipeline.interventionsConditions(interventions, conditions,
      studies)
      .select($"intervention_name", $"condition_name", $"studies")
      .as[(String, String, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      // N4 has the condition row TWICE → row-count 2, not distinct 1
      ("surgery", "congenital anomaly", 2L),
      ("tamoxifen", "breast cancer", 1L),
      ("tamoxifen", "diabetes", 1L),
      ("tamoxifen", "hematoma", 1L)))
  }

  // -- C2: dashboard extract ------------------------------------------
  test("C2 dashboard extract: left-join fan + 8-term 't'/'f' flag") {
    val dash = AactPipeline.dashboardExtract(studies, calculatedValuesRaw,
      conditions, interventionsRaw)
    // fan: N1 2cond×2int=4, N2 1×1, N3 1×null=1, N4 2cond×1int=2,
    // N5 1×null=1, N6 null×null=1 → 10 rows
    assert(dash.count() == 10)
    // the 8-term list DOES flag 'congenital anomaly' ('anoma') —
    // opposite of the 15-term C1 verdict; both literal sites preserved
    val n4 = dash.filter($"nct_id" === "N4").select($"oncology")
      .as[String].collect().toSet
    assert(n4 == Set("t"))
    val noCondition = dash.filter($"nct_id" === "N6").select($"oncology")
      .as[String].collect().toSet
    assert(noCondition == Set("f")) // NULL downcase_name → no match → 'f'
  }

  // -- C3: feature extract --------------------------------------------
  private lazy val star = Star(
    studies = studies,
    calculatedValues = AactPipeline.enrichCalculatedValues(
      calculatedValuesRaw,
      AactPipeline.studyEnrichment(studies, designs, conditions, ccv)),
    eligibilities = eligibilities,
    interventions = interventionsRaw,
    sponsors = sponsors,
    designGroupInterventions = designGroupInterventions,
    designs = designs,
    briefSummaries = briefSummaries)

  test("C3 literal vs rollup: same rows, fan-out-inflated counts differ") {
    val lit = AactPipeline.featureQueryLiteral(star)
    val rol = AactPipeline.featureQueryRollup(star)
    // filters pass only N1 (Completed, onco, enr 100, fac 3, lead) and
    // N2 (Terminated, onco, enr 50, fac 1, lead); N4 fails is_oncology
    // + status, N3 fails facilities>0 + lead sponsor, N5 fails enrollment
    assert(lit.select($"nct_id").as[String].collect().sorted.toSeq ==
      Seq("N1", "N2"))
    assert(rol.select($"nct_id").as[String].collect().sorted.toSeq ==
      Seq("N1", "N2"))
    def counts(df: DataFrame) = df
      .select($"nct_id", $"design_group_intervention_count",
        $"intervention_type_count", $"sponsor_count")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // literal: N1 fan = 2 interventions × 2 sponsors × 2 dgi = 8 rows →
    // count(dgi_id)=8 (the reference's fan-inflated semantics, §7.4.6);
    // distinct counts immune to the fan
    assert(counts(lit) == Seq(("N1", 8L, 2L, 2L), ("N2", 1L, 1L, 1L)))
    // rollup: the true per-study counts
    assert(counts(rol) == Seq(("N1", 2L, 2L, 2L), ("N2", 1L, 1L, 1L)))
    // identical except the documented fan-inflated column
    val a = lit.drop("design_group_intervention_count")
    val b = rol.drop("design_group_intervention_count")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("C1→C3 lineage runs end-to-end as ONE lazy plan (reference dataflow)") {
    // the reference's actual dataflow (init-user-db.sh:38-274 feeding
    // ct_data.py:72-151) composed with zero intermediate
    // materialization: conditionsCalculatedValues → studyEnrichment →
    // enrichCalculatedValues → featureQueryRollup → featureFrame, built
    // here from the raw fixtures in one expression so Catalyst sees the
    // WHOLE lineage
    val lineage = AactPipeline.featureFrame(
      AactPipeline.featureQueryRollup(Star(
        studies = studies,
        calculatedValues = AactPipeline.enrichCalculatedValues(
          calculatedValuesRaw,
          AactPipeline.studyEnrichment(studies, designs, conditions,
            AactPipeline.conditionsCalculatedValues(conditions, studies))),
        eligibilities = eligibilities,
        interventions = interventionsRaw,
        sponsors = sponsors,
        designGroupInterventions = designGroupInterventions,
        designs = designs,
        briefSummaries = briefSummaries)))

    val projected = lineage.select($"nct_id", $"condition_stage",
      $"number_of_arms_clean", $"start_epoch", $"status")
      .as[(String, Int, Int, Int, Int)]
    val qe = projected.queryExecution
    val got = projected.collect().sortBy(_._1).toSeq
    // the final frame is pinned (full-width expectations live in the
    // feature-frame test; this one pins the composed plan's output)
    assert(got == Seq(("N1", 1, 2, 2019, 0), ("N2", 2, 1, 2020, 1)))

    // plan-depth note: the analyzed tree of the full C1→C3 lineage is
    // deep (hundreds of nodes — 2 multi-join aggregations, 3 rollups, 7
    // encoder ladders) but single-plan: the analyzer and optimizer
    // handle it without checkpoints because nothing feeds both sides of
    // a self-referencing loop (unlike dedupClusters). Keep this
    // assertion as the canary: if composition ever needs a checkpoint
    // to analyze, the library's "compose freely" contract broke.
    val analyzedNodes = qe.analyzed.collect { case n => n }.size
    assert(analyzedNodes > 50, s"suspiciously shallow plan: $analyzedNodes")

    // shuffle inventory of the whole pipeline, post-AQE (broadcast and
    // reused exchanges excluded): the two wide aggregations (conditions
    // rollup, study enrichment) + the three fan-table rollups + the
    // final wide-key group each cost one exchange, plus the distinct
    // shuffles inside the multi-countDistinct Expands. The bound is the
    // regression canary, not a target — it allows AQE re-plans without
    // masking a quadratic blowup
    val plan = qe.executedPlan.treeString
    assert(plan.contains("isFinalPlan=true"),
      s"AQE plan did not settle (${plan.length} chars):\n${plan.take(2000)}")
    val shuffles = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(plan).size
    assert(shuffles <= 14,
      s"C1→C3 shuffle inventory grew to $shuffles:\n${plan.take(4000)}")
  }

  test("C3 feature frame: encoders + condition_stage + drop list") {
    val ff = AactPipeline.featureFrame(AactPipeline.featureQueryRollup(star))
    val got = ff.select($"nct_id", $"condition_stage",
      $"number_of_arms_clean", $"start_epoch", $"study_type_category",
      $"status", $"agency_type_category", $"gender_category",
      $"allocation_type", $"enrollment_type_category",
      $"primary_purpose_type")
      .as[(String, Int, Int, Int, Int, Int, Int, Int, Int, Int, Int)]
      .collect().sortBy(_._1).toSeq
    val expected = Seq(
      // N1: 'Stage III'→1, arms 2, 2019, Interventional→2, Completed→0,
      // Industry→2, Female→2, Randomized+desc'randomized'→1, Actual→0,
      // Treatment→9
      ("N1", 1, 2, 2019, 2, 0, 2, 2, 1, 0, 9),
      // N2: 'Stage IV'→2, arms 1 → allocation forced 2 (last write),
      // Terminated→1, Industry→2, Male→1, Anticipated→1, Prevention→6
      ("N2", 2, 1, 2020, 2, 1, 2, 1, 2, 1, 6))
    assert(got == expected)
    // the reference's post-engineering drop list (ct_data.py:150-151)
    val droppedOk = Seq("start_date", "overall_status", "sponsor_type",
      "gender", "phase", "study_type", "allocation", "description")
      .forall(c => !ff.columns.contains(c))
    assert(droppedOk)
  }
}

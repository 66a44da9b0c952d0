package graft.aact

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.safeDiv

/** The reference's three pipelines (C1 derived tables, C2 dashboard
  * extract, C3 feature frame) ported onto AACT-schema'd DataFrames.
  * Inputs are plain frames carrying the AACT column names (FIXTURES.md
  * §B); sources/sinks stay outside so the logic is testable on
  * fixtures and runnable on real snapshots unchanged.
  *
  * Scale notes: every aggregation here is a single hash-aggregate on
  * the join key (map-side partial agg for the non-distinct parts); the
  * reference's five filtered left-join arms (init-user-db.sh:94-113)
  * are authored as conditional aggregation — one shuffle instead of
  * five joins. The J5 `downcase_name` leg joins a rollup that is tiny
  * relative to the fact side → broadcast.
  */
object AactPipeline {

  // ------------------------------------------------------------- C1 (1/4)
  /** `conditions_calculated_values` (reference init-user-db.sh:52-117).
    * The five filtered left-join arms feeding count(distinct) collapse
    * into `countDistinct(when(arm_filter, nct_id))` — NULLs (non-match)
    * are ignored by count(distinct), exactly the left-join-miss
    * semantics (SURVEY §7.4.4). `real` columns stay FloatType
    * (§7.4.5). */
  def conditionsCalculatedValues(conditions: DataFrame,
      studies: DataFrame): DataFrame = {
    val interventional = col("study_type") === "Interventional"
    def arm(status: String): Column =
      countDistinct(when(interventional && col("overall_status") === status,
        col("nct_id")))
    // s_done arm: status-in-list AND != 'Anticipated' is null-rejecting in
    // both engines (NULL enrollment_type never matches)
    val done = interventional &&
      col("overall_status").isin("Completed", "Terminated", "Withdrawn") &&
      col("enrollment_type") =!= "Anticipated"
    val completed = arm("Completed")
    val terminated = arm("Terminated")
    val withdrawn = arm("Withdrawn")
    conditions
      .join(studies, Seq("nct_id"), "inner")
      .groupBy(col("downcase_name"))
      .agg(
        countDistinct(when(interventional, col("nct_id")))
          .as("total_interventional_studies"),
        completed.as("completed_interventional_studies"),
        terminated.as("terminated_interventional_studies"),
        withdrawn.as("withdrawn_interventional_studies"),
        (completed + terminated + withdrawn).as("done_sum"),
        avg(when(done, col("enrollment"))).cast("float").as("enrollment_avg"),
        min(col("study_first_submitted_date")).as("first_seen_date"))
      .withColumn("is_oncology", AactTerms.oncoCondition(col("downcase_name")))
      .withColumn("intervention_completion_ratio",
        safeDiv(col("completed_interventional_studies"), col("done_sum"))
          .cast("float"))
      .select("downcase_name", "is_oncology", "total_interventional_studies",
        "completed_interventional_studies", "terminated_interventional_studies",
        "withdrawn_interventional_studies", "intervention_completion_ratio",
        "enrollment_avg", "first_seen_date")
  }

  // ------------------------------------------------------------- C1 (2/4)
  /** The `temp_calculated_values` rollup (init-user-db.sh:126-177):
    * per-study oncology flag (bool_or over condition flags, rescued by
    * the 15-term brief_title test — three-valued OR preserved), distinct
    * condition count, and the avg completion ratio through the J5
    * non-key `downcase_name` join leg. */
  def studyEnrichment(studies: DataFrame, designs: DataFrame,
      conditions: DataFrame, conditionsCalc: DataFrame): DataFrame = {
    val ce = broadcast(conditionsCalc.select(
      col("downcase_name"),
      col("is_oncology").as("ce_onco"),
      col("intervention_completion_ratio").as("ce_ratio")))
    studies
      .select("nct_id", "brief_title")
      .join(designs.select(col("nct_id"), col("primary_purpose")),
        Seq("nct_id"), "left_outer")
      .join(conditions.select(col("nct_id"), col("downcase_name")),
        Seq("nct_id"), "left_outer")
      .join(ce, Seq("downcase_name"), "left_outer")
      .groupBy(col("nct_id"), col("brief_title"), col("primary_purpose"))
      .agg(
        (bool_or(col("ce_onco")) || AactTerms.oncoTitle(col("brief_title")))
          .as("is_oncology"),
        countDistinct(col("downcase_name")).as("number_of_conditions"),
        avg(col("ce_ratio")).cast("float")
          .as("average_condition_completion_ratio"))
      .select("nct_id", "is_oncology", "number_of_conditions",
        "average_condition_completion_ratio", "primary_purpose")
  }

  /** J6: the ALTER TABLE + UPDATE-join backfill (init-user-db.sh:181-194)
    * as recompute-and-overwrite — rows with no enrichment match keep
    * NULL new columns (left join, never inner; SURVEY §7.4.8). */
  def enrichCalculatedValues(calculatedValues: DataFrame,
      enrichment: DataFrame): DataFrame =
    calculatedValues.join(
      enrichment.select("nct_id", "is_oncology", "number_of_conditions",
        "average_condition_completion_ratio", "primary_purpose"),
      Seq("nct_id"), "left_outer")

  // ------------------------------------------------------------- C1 (3/4)
  /** `interventions.downcase_name` backfill (init-user-db.sh:202-204). */
  def withDowncaseName(interventions: DataFrame): DataFrame =
    interventions.withColumn("downcase_name", lower(col("name")))

  /** `interventions_calculated_values` (init-user-db.sh:215-232). */
  def interventionsCalculatedValues(interventions: DataFrame,
      studies: DataFrame): DataFrame =
    interventions
      .filter(col("name").isNotNull)
      .select(col("nct_id"), lower(col("name")).as("intervention_name"))
      .join(studies.select("nct_id", "study_first_submitted_date"),
        Seq("nct_id"), "inner")
      .groupBy(col("intervention_name"))
      .agg(
        countDistinct(col("nct_id")).as("studies"),
        min(col("study_first_submitted_date")).as("first_seen_date"),
        max(col("study_first_submitted_date")).as("last_seen_date"))

  // ------------------------------------------------------------- C1 (4/4)
  /** `interventions_conditions` co-occurrence (init-user-db.sh:246-269).
    * `count(s.nct_id)` is a ROW count over the i×c fan — deliberately
    * not distinct (the reference's own semantics). */
  def interventionsConditions(interventions: DataFrame,
      conditions: DataFrame, studies: DataFrame): DataFrame =
    interventions
      .filter(col("downcase_name").isNotNull)
      .select(col("nct_id"), col("downcase_name").as("intervention_name"))
      .join(studies.select("nct_id", "study_first_submitted_date"),
        Seq("nct_id"), "inner")
      .join(conditions.select(col("nct_id"),
        col("downcase_name").as("condition_name")), Seq("nct_id"), "inner")
      .groupBy(col("intervention_name"), col("condition_name"))
      .agg(
        count(col("nct_id")).as("studies"),
        min(col("study_first_submitted_date")).as("first_seen_date"),
        max(col("study_first_submitted_date")).as("last_seen_date"))

  // ----------------------------------------------------------------- C2
  /** The dashboard extract (db2wh-etl.sh:74-106): studies ⟕
    * calculated_values ⟕ conditions ⟕ interventions with the 8-term
    * oncology flag as the reference's 't'/'f' CHAR(1). Write with
    * [[graft.sources.WarehouseWriter.pipeDelimited]] for the full
    * file-shape parity, or `saveTable` for the warehouse-table form. */
  def dashboardExtract(studies: DataFrame, calculatedValues: DataFrame,
      conditions: DataFrame, interventions: DataFrame): DataFrame =
    studies
      .select(col("nct_id"), col("overall_status"), col("phase"),
        col("start_date"), col("study_first_submitted_date"),
        col("study_type"), col("number_of_arms"), col("number_of_groups"),
        col("source"), col("enrollment"), col("enrollment_type"))
      .join(calculatedValues.select(col("nct_id"),
        col("number_of_facilities"), col("has_us_facility"),
        col("has_single_facility")), Seq("nct_id"), "left_outer")
      .join(conditions.select(col("nct_id"), col("downcase_name")),
        Seq("nct_id"), "left_outer")
      .join(interventions.select(col("nct_id"), col("intervention_type"),
        col("name")), Seq("nct_id"), "left_outer")
      .withColumn("oncology",
        when(AactTerms.oncoDashboard(col("downcase_name")), "t")
          .otherwise("f"))
      .select("nct_id", "overall_status", "phase", "start_date",
        "study_first_submitted_date", "study_type", "number_of_arms",
        "number_of_groups", "source", "enrollment", "enrollment_type",
        "number_of_facilities", "has_us_facility", "has_single_facility",
        "downcase_name", "oncology", "intervention_type", "name")

  // ----------------------------------------------------------------- C3
  /** All nine C3 input tables in one bag (ct_data.py:80-81). */
  final case class Star(studies: DataFrame, calculatedValues: DataFrame,
    eligibilities: DataFrame, interventions: DataFrame, sponsors: DataFrame,
    designGroupInterventions: DataFrame, designs: DataFrame,
    briefSummaries: DataFrame)

  private val c3Filters: Column =
    col("start_date") > lit(java.sql.Date.valueOf("2019-01-01")) &&
      col("is_oncology") === true &&
      col("overall_status").isin("Completed", "Terminated") &&
      col("enrollment").isNotNull && col("number_of_facilities") > 0 &&
      col("lead_or_collaborator") === "lead"

  private val conditionStage: Column =
    when(col("brief_title").like("%age III%"), 1)
      .when(col("brief_title").like("%age IV%"), 2)
      .otherwise(0)

  /** The projected/group-key columns shared by both variants (the
    * SELECT list of ct_data.py:73-91 minus the three counts). F1's
    * mixed string/int CASE is normalized to Int (SURVEY §7.4.3). */
  private def c3Select(df: DataFrame): DataFrame =
    df.select(col("nct_id"), col("start_date"), col("study_type"),
      col("enrollment_type"), col("phase"), col("overall_status"),
      col("sponsor_type"), col("number_of_facilities"), col("gender"),
      col("has_us_facility"), col("average_condition_completion_ratio"),
      conditionStage.as("condition_stage"),
      coalesce(col("number_of_arms"), lit(0)).as("number_of_arms_clean"),
      col("allocation"), col("intervention_model"), col("primary_purpose"),
      lit(0).as("drug_recency"), col("description"),
      col("design_group_intervention_count"),
      col("intervention_type_count"), col("sponsor_count"))

  /** The 9-table star with filters applied, BEFORE the fan tables are
    * attached: studies ⋈ calculated_values ⋈ eligibilities ⋈ designs ⋈
    * brief_summaries ⋈ sponsors(lead) — all 1:1-ish legs (inner, as the
    * reference's implicit joins). */
  private def c3Base(t: Star): DataFrame =
    t.studies
      .select(col("nct_id"), col("start_date"), col("study_type"),
        col("enrollment_type"), col("phase"), col("overall_status"),
        col("brief_title"), col("number_of_arms"), col("enrollment"))
      .join(t.calculatedValues.select(col("nct_id"), col("is_oncology"),
        col("number_of_facilities"), col("has_us_facility"),
        col("average_condition_completion_ratio")), Seq("nct_id"), "inner")
      .join(t.eligibilities.select(col("nct_id"), col("gender"),
        col("criteria")), Seq("nct_id"), "inner")
      .join(t.designs.select(col("nct_id"), col("allocation"),
        col("intervention_model"), col("primary_purpose")),
        Seq("nct_id"), "inner")
      .join(t.briefSummaries.select(col("nct_id"), col("description")),
        Seq("nct_id"), "inner")
      .join(t.sponsors.select(col("nct_id"),
        col("agency_class").as("sponsor_type"),
        col("lead_or_collaborator")), Seq("nct_id"), "inner")
      .filter(c3Filters)

  /** LITERAL variant (A8, SURVEY §7.4.6): the reference's own shape —
    * all nine tables joined flat, GROUP BY the full wide key, counts
    * taken over the multiplied fan (interventions × sponsors × dgi).
    * `count(dgi.id)` is fan-out-INFLATED by construction; that is the
    * reference's semantics, reproduced bit-for-bit. Quadratic-ish fan
    * per study — keep behind this explicit entry point. */
  def featureQueryLiteral(t: Star): DataFrame = {
    val joined = c3Base(t)
      .join(t.interventions.select(col("nct_id"), col("intervention_type")),
        Seq("nct_id"), "inner")
      .join(t.sponsors.select(col("nct_id"), col("name").as("sp2_name")),
        Seq("nct_id"), "inner")
      .join(t.designGroupInterventions.select(col("nct_id"),
        col("id").as("dgi_id")), Seq("nct_id"), "inner")
    val keys = Seq("nct_id", "start_date", "study_type", "enrollment_type",
      "phase", "overall_status", "sponsor_type", "number_of_facilities",
      "average_condition_completion_ratio", "gender", "has_us_facility",
      "brief_title", "number_of_arms", "criteria", "allocation",
      "intervention_model", "primary_purpose", "description")
    c3Select(joined
      .groupBy(keys.map(col): _*)
      .agg(
        count(col("dgi_id")).as("design_group_intervention_count"),
        countDistinct(col("intervention_type")).as("intervention_type_count"),
        countDistinct(col("sp2_name")).as("sponsor_count")))
  }

  /** ROLLUP variant (the 100-TB shape): each fan table pre-aggregated on
    * `nct_id` and joined back 1:1 — three small shuffles instead of a
    * multiplicative row explosion. `design_group_intervention_count`
    * here is the TRUE count (not fan-inflated); the literal variant
    * documents the difference (pinned in AactPipelineSpec). */
  def featureQueryRollup(t: Star): DataFrame = {
    val itypes = t.interventions.groupBy(col("nct_id"))
      .agg(countDistinct(col("intervention_type")).as("intervention_type_count"))
    val sps = t.sponsors.groupBy(col("nct_id"))
      .agg(countDistinct(col("name")).as("sponsor_count"))
    val dgis = t.designGroupInterventions.groupBy(col("nct_id"))
      .agg(count(col("id")).as("design_group_intervention_count"))
    c3Select(c3Base(t)
      .join(itypes, Seq("nct_id"), "inner")
      .join(sps, Seq("nct_id"), "inner")
      .join(dgis, Seq("nct_id"), "inner"))
  }

  /** Post-extract feature engineering (ct_data.py:106-151): start_epoch,
    * the seven encoder ladders, then the training-frame column drop. */
  def featureFrame(extracted: DataFrame): DataFrame =
    AactEncoders.encodeAll(
      extracted.withColumn("start_epoch", year(col("start_date"))))
      .drop("start_date", "overall_status",
        "average_condition_completion_ratio", "sponsor_type", "gender",
        "phase", "study_type", "enrollment_type", "allocation",
        "intervention_model", "primary_purpose", "description",
        "has_us_facility")
}

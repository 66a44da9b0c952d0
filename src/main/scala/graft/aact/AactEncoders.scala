package graft.aact

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.{codeOf, lastWriteWins}

/** The reference's F10 categorical-encoding ladders, ported literally
  * (reference src/main/py/ct_data.py:107-146). Each pandas `.loc` masked
  * assignment is a (condition, code) write in PROGRAM order; later
  * writes override earlier ones. Disjoint-equality ladders compile to
  * [[codeOf]] when-chains (first-match == last-match); only the
  * allocation ladder has overlapping masks and needs the reversed
  * [[lastWriteWins]] chain.
  *
  * The reference's `.str.contains('randomized')` also matches
  * 'non-randomized' — preserved, not fixed (SURVEY §7.4.1).
  */
object AactEncoders {

  /** study_type → code (ct_data.py:115-118). */
  val studyType: Seq[(String, Int)] = Seq(
    "Expanded Access" -> 1,
    "Interventional" -> 2,
    "Observational" -> 3,
    "Observational [Patient Registry]" -> 4)

  /** overall_status → label (ct_data.py:119-120; classes at :28-29). */
  val status: Seq[(String, Int)] = Seq(
    "Completed" -> 0,
    "Terminated" -> 1)

  /** sponsor_type (agency_class alias) → code (ct_data.py:121-124). */
  val agencyType: Seq[(String, Int)] = Seq(
    "U.S. Fed" -> 0,
    "NIH" -> 1,
    "Industry" -> 2,
    "Other" -> 3)

  /** gender → code (ct_data.py:125-126). */
  val gender: Seq[(String, Int)] = Seq(
    "Male" -> 1,
    "Female" -> 2)

  /** enrollment_type → code (ct_data.py:137). */
  val enrollmentType: Seq[(String, Int)] = Seq(
    "Anticipated" -> 1)

  /** primary_purpose → code (ct_data.py:138-146). */
  val primaryPurpose: Seq[(String, Int)] = Seq(
    "Basic Science" -> 1,
    "Device Feasibility" -> 2,
    "Diagnostic" -> 3,
    "Educational/Counseling/Training" -> 4,
    "Health Services Research" -> 5,
    "Prevention" -> 6,
    "Screening" -> 7,
    "Supportive Care" -> 8,
    "Treatment" -> 9)

  /** The allocation ladder (ct_data.py:127-131) — the one genuinely
    * order-dependent ladder: five writes, overlapping masks.
    * NB the reference's inner-join extract guarantees `description`
    * non-null; Spark `contains` on NULL yields NULL which `when` treats
    * as no-match — same outcome as an all-false pandas mask.
    */
  def allocationType(allocation: Column, description: Column,
      armsClean: Column): Column =
    lastWriteWins(Seq(
      (allocation === "Randomized", lit(1)),
      (description.contains("randomized"), lit(1)),
      (allocation === "Non-Randomized", lit(2)),
      (description.contains("non-randomized"), lit(2)),
      (armsClean === 1, lit(2))),
      default = lit(0))

  /** Apply all seven ladders to a frame carrying the AACT column names
    * (`study_type`, `overall_status`, `sponsor_type`, `gender`,
    * `allocation`, `description`, `number_of_arms_clean`,
    * `enrollment_type`, `primary_purpose`). Pure column appends — no
    * shuffle, whole-stage codegen'd. */
  def encodeAll(df: DataFrame): DataFrame =
    df
      .withColumn("study_type_category", codeOf(col("study_type"), studyType))
      .withColumn("status", codeOf(col("overall_status"), status))
      .withColumn("agency_type_category", codeOf(col("sponsor_type"), agencyType))
      .withColumn("gender_category", codeOf(col("gender"), gender))
      .withColumn("allocation_type",
        allocationType(col("allocation"), col("description"),
          col("number_of_arms_clean")))
      .withColumn("enrollment_type_category",
        codeOf(col("enrollment_type"), enrollmentType))
      .withColumn("primary_purpose_type",
        codeOf(col("primary_purpose"), primaryPurpose))
}

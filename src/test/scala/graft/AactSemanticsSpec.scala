package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.aact.{AactEncoders, AactTerms}

/** Pins the literal AACT semantics on AACT-shaped fixture rows
  * (FIXTURES.md §B): the 8-vs-15-term oncology site drift and the F10
  * encoder ladders' last-write-wins order, against hand-computed
  * expectations from the reference sources
  * (db2wh-etl.sh:90-97, init-user-db.sh:63-77,144-158,
  * ct_data.py:107-146).
  */
class AactSemanticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- term lists
  test("term lists match the reference sites exactly") {
    assert(AactTerms.dashboard8.size == 8)
    assert(AactTerms.condition15.size == 15)
    assert(AactTerms.title15.size == 15)
    // the drift: dashboard says 'anoma', both 15-term sites say 'lanoma'
    assert(AactTerms.dashboard8.contains("anoma"))
    assert(!AactTerms.dashboard8.contains("lanoma"))
    assert(AactTerms.condition15.contains("lanoma"))
    assert(!AactTerms.condition15.contains("anoma"))
    // the two 15-term sites are the same SET in different site order
    assert(AactTerms.condition15.toSet == AactTerms.title15.toSet)
    assert(AactTerms.condition15 != AactTerms.title15)
  }

  test("oncology flags: 8-vs-15-term site differences") {
    val rows = Seq(
      // name                          dash8  cond15
      ("breast cancer",                true,  true),   // 'ancer'
      ("melanoma",                     true,  true),   // 'anoma' / 'lanoma'
      ("congenital anomaly",           true,  false),  // 'anoma' only
      ("hematoma",                     false, true),   // 'toma' only
      ("multiple myeloma",             false, true),   // 'yeloma' only
      ("glioma",                       false, true),   // 'lioma' only
      ("myelodysplastic syndrome",     false, true),   // 'myelodysplas'
      ("estrogen receptor positive",   false, true),
      ("progesterone receptor status", false, true),   // 'sterone receptor'
      ("her2/neu negative carcinoma",  true,  true),
      ("diabetes mellitus",            false, false),
      ("benign tumour",                true,  true))   // 'umour'
    val df = rows.toDF("downcase_name", "exp8", "exp15")
      .withColumn("got8", AactTerms.oncoDashboard($"downcase_name"))
      .withColumn("got15", AactTerms.oncoCondition($"downcase_name"))
    val bad = df.filter($"got8" =!= $"exp8" || $"got15" =!= $"exp15")
      .select($"downcase_name").as[String].collect()
    assert(bad.isEmpty, s"misclassified: ${bad.mkString(", ")}")
  }

  test("title variant flags the same rows as the condition variant") {
    val names = Seq("breast cancer", "melanoma", "congenital anomaly",
      "hematoma", "diabetes").toDF("t")
    val diff = names.filter(
      AactTerms.oncoTitle($"t") =!= AactTerms.oncoCondition($"t")).count()
    assert(diff == 0)
  }

  // ---------------------------------------------------- encoder ladders
  private def fixture = Seq(
    // (id, study_type, overall_status, sponsor_type, gender, allocation,
    //  description, arms, enrollment_type, primary_purpose)
    (1, "Interventional", "Completed", "Industry", "Male", "Randomized",
      "a randomized trial", 3, "Actual", "Treatment"),
    // allocation='Randomized' writes 1, then arms==1 overrides to 2 (last write wins)
    (2, "Observational", "Terminated", "NIH", "Female", "Randomized",
      "plain text", 1, "Anticipated", "Prevention"),
    // description contains BOTH 'randomized' (→1) and 'non-randomized' (→2);
    // the later non-randomized write wins (ct_data.py:128-130 order)
    (3, "Expanded Access", "Recruiting", "U.S. Fed", "All", "N/A",
      "a non-randomized study", 2, "Actual", "Screening"),
    // allocation='Non-Randomized' (→2) after contains('randomized') (→1): 2 wins
    (4, "Observational [Patient Registry]", "Completed", "Other", "Male",
      "Non-Randomized", "randomized cohort", 4, "Actual", "Basic Science"),
    // nothing matches anywhere → all defaults
    (5, "Unknown", "Suspended", "Network", "Unknown", "N/A",
      "plain", 0, "Actual", "Unknown"))
    .toDF("id", "study_type", "overall_status", "sponsor_type", "gender",
      "allocation", "description", "number_of_arms_clean", "enrollment_type",
      "primary_purpose")

  test("encoder ladders reproduce ct_data.py codes incl. override order") {
    val got = AactEncoders.encodeAll(fixture)
      .select($"id", $"study_type_category", $"status",
        $"agency_type_category", $"gender_category", $"allocation_type",
        $"enrollment_type_category", $"primary_purpose_type")
      .as[(Int, Int, Int, Int, Int, Int, Int, Int)]
      .collect().sortBy(_._1)
    val expected = Seq(
      (1, 2, 0, 2, 1, 1, 0, 9),
      (2, 3, 1, 1, 2, 2, 1, 6),  // arms==1 overrides Randomized
      (3, 1, 0, 0, 0, 2, 0, 7),  // 'non-randomized' write wins
      (4, 4, 0, 3, 1, 2, 0, 1),  // Non-Randomized beats earlier contains-1
      (5, 0, 0, 0, 0, 0, 0, 0))  // defaults
    assert(got.toSeq == expected)
  }

  test("null description behaves as an all-false mask (no match, no code)") {
    val df = Seq(("x")).toDF("allocation")
      .withColumn("description", lit(null).cast("string"))
      .withColumn("number_of_arms_clean", lit(3))
    val code = df.select(
      AactEncoders.allocationType($"allocation", $"description",
        $"number_of_arms_clean").as("c")).as[Int].head()
    assert(code == 0)
  }
}

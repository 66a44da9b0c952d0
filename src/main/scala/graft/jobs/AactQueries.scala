package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.aact.{AactEncoders, AactTerms}

/** The reference's literal AACT semantics exercised as oracle-checked
  * queries over the driver tables (the AACT-shaped fixture specs pin
  * the same code on handcrafted rows — AactSemanticsSpec).
  *
  * q30 runs the exact oncology term lists (8-term dashboard vs 15-term
  * condition variants, reference db2wh-etl.sh:90-97 and
  * init-user-db.sh:63-77) over `documents.text`. q31 runs the full F10
  * encoder ladders (reference ct_data.py:107-146) over an AACT-shaped
  * derivation of `orders` ⋈ `customer` — the ladder conditions, codes,
  * and last-write-wins order are the reference's own; only the input
  * column derivation is synthetic (the driver schema is TPC-H-ish).
  */
object AactQueries {

  // ---------------------------------------------------------------- q30
  /** Oncology flags: both literal term lists side by side + where the
    * site drift makes them disagree. Pure per-row expression work. */
  def q30OncologyFlags(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        $"doc_id",
        AactTerms.oncoDashboard(lower($"text")).as("onco_dashboard"),
        AactTerms.oncoCondition(lower($"text")).as("onco_condition"))
      .withColumn("site_disagrees", $"onco_dashboard" =!= $"onco_condition")
  }

  // ---------------------------------------------------------------- q31
  /** AACT-named column derivation from the star schema. Mirrored
    * verbatim in the oracle SQL — keep the two in sync. */
  private def derive(o: DataFrame, c: DataFrame): DataFrame = {
    val spark = o.sparkSession
    import spark.implicits._
    def code(k: Column, m: Seq[(Any, String)], default: String): Column =
      m.foldLeft(Option.empty[Column]) {
        case (None, (v, s))      => Some(when(k === lit(v), s))
        case (Some(acc), (v, s)) => Some(acc.when(k === lit(v), s))
      }.get.otherwise(default)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(
        $"o_orderkey",
        code($"o_orderpriority", Seq(
          "1-URGENT" -> "Expanded Access",
          "2-HIGH" -> "Interventional",
          "3-MEDIUM" -> "Observational",
          "4-NOT SPECIFIED" -> "Observational [Patient Registry]"),
          "Unknown").as("study_type"),
        code($"o_orderstatus", Seq("F" -> "Completed", "O" -> "Terminated"),
          "Recruiting").as("overall_status"),
        code($"c_mktsegment", Seq(
          "BUILDING" -> "U.S. Fed", "AUTOMOBILE" -> "NIH",
          "MACHINERY" -> "Industry", "HOUSEHOLD" -> "Other"),
          "Network").as("sponsor_type"),
        code($"o_orderkey" % 3, Seq(1 -> "Male", 2 -> "Female"), "All")
          .as("gender"),
        code($"o_orderkey" % 5, Seq(0 -> "Randomized", 1 -> "Non-Randomized"),
          "N/A").as("allocation"),
        code($"o_orderkey" % 7, Seq(
          0 -> "a non-randomized design", 1 -> "a randomized design"),
          "unspecified design").as("description"),
        ($"o_orderkey" % 4).as("number_of_arms_clean"),
        code($"o_orderkey" % 2, Seq(0 -> "Anticipated"), "Actual")
          .as("enrollment_type"),
        code($"o_orderkey" % 10, Seq(
          1 -> "Basic Science", 2 -> "Device Feasibility", 3 -> "Diagnostic",
          4 -> "Educational/Counseling/Training",
          5 -> "Health Services Research", 6 -> "Prevention", 7 -> "Screening",
          8 -> "Supportive Care", 9 -> "Treatment"), "Unknown")
          .as("primary_purpose"))
  }

  /** Full F10 ladder pass over the AACT-shaped frame. */
  def q31EncodeLadders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    AactEncoders.encodeAll(
      derive(Tables.load(spark, dir, "orders"),
        Tables.load(spark, dir, "customer")))
      .select($"o_orderkey", $"study_type_category", $"status",
        $"agency_type_category", $"gender_category", $"allocation_type",
        $"enrollment_type_category", $"primary_purpose_type")
  }

  // ---------------------------------------------------------------- q32
  /** The LITERAL A8 wide-key GROUP BY with two fan roles of one table
    * (reference ct_data.py:80-91: sponsors as sp/sp2, the 16-col group
    * key, and `count(dgi.id)` taken over the multiplied fan — SURVEY
    * §7.4.6 requires this literal variant alongside the rollup).
    * `li_count_inflated` is deliberately fan-out-inflated; the distinct
    * counts are immune. Same shape on the driver schema: lineitem in
    * two roles (filtered 'R' vs unfiltered) against orders. */
  def q32WidekeyFanout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    val lr = l.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("r_orderkey"), $"l_suppkey".as("r_suppkey"))
    val l2 = l.select($"l_orderkey", $"l_linenumber", $"l_partkey")
    o.join(lr, $"o_orderkey" === $"r_orderkey")
      .join(l2, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderstatus", $"o_orderpriority",
        $"o_totalprice", $"o_orderdate")
      .agg(
        count($"l_linenumber").as("li_count_inflated"),
        countDistinct($"r_suppkey").as("r_supp_count"),
        countDistinct($"l_partkey").as("part_count"))
  }

  // ================================================================ maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_oncology_flags" -> (q30OncologyFlags _),
    "q31_encode_ladders" -> (q31EncodeLadders _),
    "q32_widekey_fanout" -> (q32WidekeyFanout _))

  private def orSql(c: String, terms: Seq[String]): String =
    terms.map(t => s"contains($c,'$t')").mkString("(", " OR ", ")")

  val oracle: Map[String, String] = Map(
    "q30_oncology_flags" ->
      s"""WITH l AS (SELECT doc_id, lower(text) AS t FROM documents)
         SELECT doc_id,
           ${orSql("t", AactTerms.dashboard8)} AS onco_dashboard,
           ${orSql("t", AactTerms.condition15)} AS onco_condition,
           ${orSql("t", AactTerms.dashboard8)} <>
             ${orSql("t", AactTerms.condition15)} AS site_disagrees
         FROM l""",
    "q32_widekey_fanout" ->
      """SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority,
           o.o_totalprice, o.o_orderdate,
           count(l2.l_linenumber) AS li_count_inflated,
           count(DISTINCT l.l_suppkey) AS r_supp_count,
           count(DISTINCT l2.l_partkey) AS part_count
         FROM orders o, lineitem l, lineitem l2
         WHERE o.o_orderkey = l.l_orderkey AND o.o_orderkey = l2.l_orderkey
           AND l.l_returnflag = 'R'
         GROUP BY o.o_orderkey, o.o_orderstatus, o.o_orderpriority,
           o.o_totalprice, o.o_orderdate""",
    "q31_encode_ladders" ->
      """WITH derived AS (
           SELECT o.o_orderkey,
             CASE o_orderpriority WHEN '1-URGENT' THEN 'Expanded Access'
               WHEN '2-HIGH' THEN 'Interventional'
               WHEN '3-MEDIUM' THEN 'Observational'
               WHEN '4-NOT SPECIFIED' THEN 'Observational [Patient Registry]'
               ELSE 'Unknown' END AS study_type,
             CASE o_orderstatus WHEN 'F' THEN 'Completed'
               WHEN 'O' THEN 'Terminated' ELSE 'Recruiting' END AS overall_status,
             CASE c.c_mktsegment WHEN 'BUILDING' THEN 'U.S. Fed'
               WHEN 'AUTOMOBILE' THEN 'NIH' WHEN 'MACHINERY' THEN 'Industry'
               WHEN 'HOUSEHOLD' THEN 'Other' ELSE 'Network' END AS sponsor_type,
             CASE o_orderkey % 3 WHEN 1 THEN 'Male' WHEN 2 THEN 'Female'
               ELSE 'All' END AS gender,
             CASE o_orderkey % 5 WHEN 0 THEN 'Randomized'
               WHEN 1 THEN 'Non-Randomized' ELSE 'N/A' END AS allocation,
             CASE o_orderkey % 7 WHEN 0 THEN 'a non-randomized design'
               WHEN 1 THEN 'a randomized design'
               ELSE 'unspecified design' END AS description,
             o_orderkey % 4 AS arms,
             CASE o_orderkey % 2 WHEN 0 THEN 'Anticipated'
               ELSE 'Actual' END AS enrollment_type,
             CASE o_orderkey % 10 WHEN 1 THEN 'Basic Science'
               WHEN 2 THEN 'Device Feasibility' WHEN 3 THEN 'Diagnostic'
               WHEN 4 THEN 'Educational/Counseling/Training'
               WHEN 5 THEN 'Health Services Research' WHEN 6 THEN 'Prevention'
               WHEN 7 THEN 'Screening' WHEN 8 THEN 'Supportive Care'
               WHEN 9 THEN 'Treatment' ELSE 'Unknown' END AS primary_purpose
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
         SELECT o_orderkey,
           CASE study_type WHEN 'Expanded Access' THEN 1
             WHEN 'Interventional' THEN 2 WHEN 'Observational' THEN 3
             WHEN 'Observational [Patient Registry]' THEN 4
             ELSE 0 END AS study_type_category,
           CASE overall_status WHEN 'Completed' THEN 0 WHEN 'Terminated' THEN 1
             ELSE 0 END AS status,
           CASE sponsor_type WHEN 'U.S. Fed' THEN 0 WHEN 'NIH' THEN 1
             WHEN 'Industry' THEN 2 WHEN 'Other' THEN 3
             ELSE 0 END AS agency_type_category,
           CASE gender WHEN 'Male' THEN 1 WHEN 'Female' THEN 2
             ELSE 0 END AS gender_category,
           CASE WHEN arms = 1 THEN 2
             WHEN contains(description,'non-randomized') THEN 2
             WHEN allocation = 'Non-Randomized' THEN 2
             WHEN contains(description,'randomized') THEN 1
             WHEN allocation = 'Randomized' THEN 1
             ELSE 0 END AS allocation_type,
           CASE enrollment_type WHEN 'Anticipated' THEN 1
             ELSE 0 END AS enrollment_type_category,
           CASE primary_purpose WHEN 'Basic Science' THEN 1
             WHEN 'Device Feasibility' THEN 2 WHEN 'Diagnostic' THEN 3
             WHEN 'Educational/Counseling/Training' THEN 4
             WHEN 'Health Services Research' THEN 5 WHEN 'Prevention' THEN 6
             WHEN 'Screening' THEN 7 WHEN 'Supportive Care' THEN 8
             WHEN 'Treatment' THEN 9 ELSE 0 END AS primary_purpose_type
         FROM derived""")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality gate — the expectation-suite station (Deequ /
  * Great-Expectations lineage) every production ingest runs before a
  * snapshot is promoted. The reference bakes its gate into the ETL as
  * ad-hoc shell checks around the load (`db2wh-etl.sh:60-88` verifies
  * row counts and exits non-zero on drift); this is the declarative,
  * engine-native form of the same station.
  *
  * Design for scale: every check's `value` is an AGGREGATE expression,
  * so the whole suite compiles to ONE `Aggregate` over the table —
  * map-side partial aggregation does the heavy lifting and the shuffle
  * carries a single row per partial. Adding a check adds a column to
  * that aggregate, not a pass over the data. The pass/fail verdicts are
  * then scalar projections over the one-row result, exploded into the
  * `(check_name, value, passed)` report a CI gate or dashboard consumes.
  *
  * Exact `count(distinct)` checks add the usual two-phase distinct
  * expansion; at 100 TB swap in `approx_count_distinct` (the q02 HLL
  * escape hatch, ScaleOpsSpec) if the key cardinality makes exactness
  * unaffordable.
  */
object Validate {

  /** One expectation: `value` is any aggregate expression over the
    * validated frame; `passed` maps the aggregated value to the
    * verdict. A null aggregated value (e.g. `min` over an empty table)
    * fails the check — a gate must not promote what it cannot measure.
    */
  final case class Check(name: String, value: Column, passed: Column => Column)

  /** Exact fraction of rows satisfying `cond`: integer conditional sum
    * over exact count, ONE double division at the end — deterministic
    * across engines and partitionings (a double `avg` would accumulate
    * in scan order). Null on an empty frame (no rows to measure). */
  def ratio(cond: Column): Column =
    when(count(lit(1)) > 0,
      sum(when(cond, 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double"))

  /** Guarded aggregate-over-aggregate quotient (null, not a
    * DIVIDE_BY_ZERO under ANSI mode, on an empty frame) — e.g.
    * `fraction(countDistinct($"id"), count(lit(1)))` for uniqueness. */
  def fraction(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double"))

  /** Referential-coverage audit between a fact table and the reference
    * table a downstream join depends on (documents ←→ embeddings, fact
    * ←→ dimension): per fact-side group, `n_facts` rows, `n_covered`
    * with a matching reference key, `n_missing` without one, and
    * `coverage` = covered/facts. Distinct reference keys matching no
    * fact are tallied as `n_orphans` — those rows carry no fact-side
    * attributes, so they land on the null-group row (or the single
    * global row when `groupCols` is empty).
    *
    * Reference keys are de-duplicated before the join, so a
    * double-loaded reference row can neither double-count coverage nor
    * fan facts out; orphan count is therefore DISTINCT orphan keys.
    *
    * Scale shape: the ref-side `distinct` aggregates map-side first,
    * then ONE full-outer equi-join on the key (shuffle-free when both
    * sides ride the bucketed S10 layout) feeds a low-cardinality
    * rollup whose shuffle carries one row per (partition, group). The
    * `coverage` division happens once per group, after aggregation —
    * integer counts in, one IEEE double out, so the value is identical
    * across engines and partitionings. */
  def referentialCoverage(facts: DataFrame, refs: DataFrame,
      factKey: String, refKey: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val f = facts.select(col(factKey).as("_f_id") +: groupCols.map(col): _*)
    val r = refs.select(col(refKey).as("_r_id")).distinct()
    f.join(r, col("_f_id") === col("_r_id"), "full_outer")
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("_f_id").isNotNull, 1L).otherwise(0L)).as("n_facts"),
        sum(when(col("_f_id").isNotNull && col("_r_id").isNotNull, 1L)
          .otherwise(0L)).as("n_covered"),
        sum(when(col("_f_id").isNotNull && col("_r_id").isNull, 1L)
          .otherwise(0L)).as("n_missing"),
        sum(when(col("_f_id").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .withColumn("coverage",
        when(col("n_facts") > 0,
          col("n_covered").cast("double") / col("n_facts").cast("double")))
  }

  /** Run the expectation suite in one aggregate pass; returns the
    * `(check_name, value double, passed boolean)` report, one row per
    * check. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Validate.report: empty check suite")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size,
      s"Validate.report: duplicate check names ${names.diff(names.distinct).distinct.mkString(", ")}")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.value.as(s"_v$i") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"_v$i").cast("double").as("value"),
        coalesce(c.passed(col(s"_v$i")), lit(false)).as("passed"))
    }
    row
      .select(explode(array(entries: _*)).as("r"))
      .select(col("r.check_name").as("check_name"),
        col("r.value").as("value"), col("r.passed").as("passed"))
  }
}

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

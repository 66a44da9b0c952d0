package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation selection operators — the "which documents make the
  * training cut" stations downstream of scoring (q19) and dedup. The
  * reference's pipeline curates implicitly (its dashboards read
  * whatever the monthly dump loaded, `init-user-db.sh:38-120`); a
  * training-data pipeline must instead select under explicit budgets,
  * and the selection must be deterministic so a rebuilt corpus is the
  * same corpus.
  */
object Curation {

  /** Greedy selection of the best-scoring documents under a global
    * token budget: documents ordered by (`quality_score` desc, `doc_id`
    * asc) are kept while the running token total stays ≤ `budget`.
    * Returns the kept rows with the input's columns. `scored` must
    * carry `doc_id`, `token_count`, and a PRE-ROUNDED `quality_score`
    * (rounding after ordering would let cross-engine float ulps flip
    * the cut; rounding before makes the order portable — and bounds
    * the score-rollup cardinality below).
    *
    * `budget` is a Column so a relative budget ("half the corpus") can
    * enter as a scalar subquery (`df.agg(...).scalar()`) instead of a
    * driver-side collect or a constant-folded cross join.
    *
    * Scale shape: the ONLY global ordering runs over the per-score
    * rollup — bounded by distinct ROUNDED scores (≤ ~10⁴ rows at any
    * corpus size), never the corpus. Documents join that tiny rollup
    * broadcast-wise; fully-kept and fully-dropped scores resolve
    * per-row with no further shuffle, and only the single boundary
    * score's documents pay a (partitioned, per-score) running-sum
    * window. The naive form — one global window over every document —
    * is what the DuckDB oracle runs; CurationSpec pins this shape equal
    * to it (boundary-splitting, exact-fit, and zero/NULL-budget edges
    * included). An empty or all-filtered corpus yields a NULL budget,
    * and the contract is empty-out (three-valued `<=` keeps nothing) —
    * also spec-pinned. */
  def selectUnderTokenBudget(scored: DataFrame, budget: Column): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val byScore = scored.groupBy($"quality_score")
      .agg(sum($"token_count").as("_score_tokens"))
    // global running total BEFORE each score — over the bounded rollup
    val cumW = Window.orderBy($"quality_score".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = byScore
      .withColumn("_cum_before",
        coalesce(sum($"_score_tokens").over(cumW), lit(0L)))
      .withColumn("_full_keep", $"_cum_before" + $"_score_tokens" <= budget)
      .withColumn("_boundary", !$"_full_keep" && $"_cum_before" <= budget)
    val tagged = scored.join(
      cum.select($"quality_score", $"_cum_before", $"_full_keep", $"_boundary"),
      Seq("quality_score"))
    val outCols = scored.columns.map(col).toSeq
    val fullKeep = tagged.filter($"_full_keep").select(outCols: _*)
    // only the boundary score's docs need a per-doc running sum — a
    // window PARTITIONED by the score, fed by a boundary-only filter
    val inScoreW = Window.partitionBy($"quality_score").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = tagged.filter($"_boundary")
      .withColumn("_cum_in", sum($"token_count").over(inScoreW))
      .filter($"_cum_before" + $"_cum_in" <= budget)
      .select(outCols: _*)
    fullKeep.unionByName(boundary)
  }
}

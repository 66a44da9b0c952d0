package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expressions.ArrayDotProduct

/** Embedding-vector `Column` builders over `array<float>` columns.
  * Math is done in double (cast per element) so results are stable and
  * comparable across engines; everything is a Catalyst expression tree,
  * no UDF. The dot-product hot path is a native codegen'd expression
  * ([[graft.expressions.ArrayDotProduct]]) with [[dotHof]] as the
  * built-in-functions twin it is proven bit-identical to.
  */
object VectorOps {

  /** Element-wise cast to double — a plain `Cast(array<float> →
    * array<double>)`, which stays inside whole-stage codegen (a
    * `transform(v, _.cast(...))` formulation is a higher-order function
    * and would force the whole projection to interpreted eval). Widening
    * float→double is exact, so results are unchanged. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product of two double arrays — native codegen'd loop. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(ArrayDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Higher-order-function form of [[dot]] (interpreted lambda per
    * element). Kept as the semantics reference for the parity spec and
    * as the fallback if a deployment cannot ship native expressions. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays with precomputed norms.
    * A zero-norm vector has no direction, so its cosine is NULL — the
    * engine-wide "non-comparable candidate → dropped" stance (every
    * rank step filters null sims). The `nullif` guard matters twice
    * over: under ANSI mode (Spark 4's default) a bare division would
    * ABORT THE JOB with DIVIDE_BY_ZERO the moment one all-zero
    * embedding enters a corpus, and with ANSI off it would yield NaN —
    * which is not null, sails through null filters, and poisons
    * NaN-naive comparators (TopKSpec pins the end-to-end behavior). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / nullif(normA * normB, lit(0.0))

  /** Cosine similarity rounded to 4 decimals with -0.0 folded to 0.0
    * (`+ 0.0` is the IEEE identity that erases the sign of zero in both
    * Spark and DuckDB) — ranking and thresholding on this value keeps
    * cross-engine float summation-order differences at the 15th decimal
    * from flipping near-tie decisions. */
  def roundedSim(c: Column): Column = round(c, 4) + lit(0.0)

  /** Sign-bit bucket from fixed coordinate projections — a deterministic,
    * engine-portable LSH for blocking: bit j = (v[coords(j)] > 0).
    * With k coordinates the candidate space shrinks ~2^k per block. */
  def signBucket(v: Column, coords: Seq[Int]): Column =
    coords.zipWithIndex
      .map { case (c, j) =>
        when(element_at(v, c + 1) > 0, lit(1 << (coords.size - 1 - j))).otherwise(lit(0))
      }
      .reduce(_ + _)
}

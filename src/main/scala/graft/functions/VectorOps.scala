package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector `Column` builders over `array<float>` columns.
  * Math is done in double (cast per element) so results are stable and
  * comparable across engines; everything is a Catalyst expression tree
  * (zip_with / aggregate), no UDF.
  */
object VectorOps {

  /** Element-wise cast to double. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays with precomputed norms. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

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

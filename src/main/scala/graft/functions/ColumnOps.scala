package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure `Column` builders — the engine's scalar-function layer.
  *
  * Everything here composes built-in Catalyst expressions, so the whole
  * layer stays inside whole-stage codegen (no UDF serialization tax).
  * Semantics re-expressed from the reference:
  *  - multi-substring classifier: reference init-user-db.sh:62-80,143-161
  *    and db2wh-etl.sh:89-100 (the "oncology" term-disjunction)
  *  - safe ratio: reference init-user-db.sh:85-89
  *  - last-write-wins masked assignment: reference ct_data.py:107-146
  *    (pandas `.loc` ladders, later writes override earlier ones)
  */
object ColumnOps {

  /** Disjunction of substring-containment tests over one column.
    * `anyTerm(c, Seq("ancer","cinoma"))` ≡ `c contains any term`.
    * Stays a plain expression tree → codegen'd into one pass per row. */
  def anyTerm(c: Column, terms: Seq[String]): Column =
    terms.map(t => c.contains(t)).reduce(_ || _)

  /** Division guarded against a zero/negative denominator; yields 0.0
    * instead (reference's CASE WHEN denom > 0 pattern). */
  def safeDiv(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  /** Encode a pandas-style masked-assignment ladder.
    *
    * `writes` are (condition, value) pairs in PROGRAM order; later writes
    * overwrite earlier ones (pandas `.loc` semantics). A `when` chain
    * returns the FIRST match, so the chain is built in REVERSE order.
    */
  def lastWriteWins(writes: Seq[(Column, Column)], default: Column): Column = {
    require(writes.nonEmpty, "need at least one write")
    val rev = writes.reverse
    rev.tail
      .foldLeft(when(rev.head._1, rev.head._2)) { case (acc, (c, v)) => acc.when(c, v) }
      .otherwise(default)
  }

  /** Integer-code lookup `value -> code` with a default — the when-chain
    * form of a dictionary encode (no UDF, no shuffle). */
  def codeOf(c: Column, mapping: Seq[(String, Int)], default: Int = 0): Column =
    mapping
      .foldLeft(Option.empty[Column]) {
        case (None, (k, v))      => Some(when(c === k, lit(v)))
        case (Some(acc), (k, v)) => Some(acc.when(c === k, lit(v)))
      }
      .get
      .otherwise(lit(default))
}

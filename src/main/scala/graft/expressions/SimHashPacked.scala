package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash fingerprint over a pre-hashed token array
  * (`array<long>` → `long`).
  *
  * The composable form ([[graft.functions.TextOps.simhashVotes]] +
  * [[graft.functions.TextOps.simhashPack]]) folds a 64-wide `zip_with`
  * per token — an interpreted lambda dispatch and a fresh 64-element
  * vote array allocation per token per row, and the HOF call site falls
  * out of whole-stage codegen. This expression runs the same
  * votes-then-pack computation as one primitive loop nest inside
  * codegen: O(tokens × bits) branch-free adds on a stack vote array,
  * zero allocations beyond it. On the documents corpus that loop is the
  * entire per-row cost of SimHash dedup (SURVEY §7.2 slice 5).
  *
  * Semantics mirror the HOF pipeline bit for bit (spec-locked in
  * SimHashExprSpec):
  *   - vote j per token = +1 if bit j of the token hash is set else −1;
  *   - fingerprint bit j set iff vote tally j is strictly positive;
  *   - empty array → fingerprint 0 (all tallies 0, no bit set);
  *   - NULL array / NULL element → NULL (standard null-in-null-out; the
  *     HOF twin collapses a NULL array to 0 through its per-bit
  *     `when(...).otherwise(0)` — an artifact unreachable through
  *     [[graft.operators.Dedup.simhashFingerprints]], which filters to
  *     non-null, non-empty token arrays).
  */
case class SimHashPacked(child: Expression, bits: Int)
    extends UnaryExpression {

  // shape param validated at analysis (clean AnalysisException from SQL)
  // rather than a constructor require — see MinHashBandKeys
  override def checkInputDataTypes(): TypeCheckResult =
    if (bits < 1 || bits > 64) TypeCheckResult.TypeCheckFailure(
      s"bits must be in [1, 64], got $bits")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |if (!${ev.isNull}) {
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ($votes[$j] > 0) $fp |= (1L << $j);
         |  }
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashPacked = copy(child = newChild)
}

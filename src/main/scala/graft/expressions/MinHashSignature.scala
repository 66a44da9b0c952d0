package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over a shingle array (`array<string>` →
  * `array<bigint>` of length `numHashes`).
  *
  * The composable form ([[graft.functions.TextOps.minhashSignature]]:
  * `transform(sequence(...), seed -> array_min(transform(sh, s ->
  * xxhash64(s, seed))))`) re-walks the shingle array once per seed with
  * an interpreted lambda per element — O(seeds × shingles) dispatches
  * and a materialized hash array per seed per row. This expression
  * computes the same signature in one pass: each shingle is xxhash64'd
  * ONCE (`XXH64.hashUTF8String(s, 42)` — Spark's own kernel, so values
  * are bit-identical), then the per-seed variation reuses that base via
  * `hashInt(seed, base)`, exactly the fold Spark's two-child
  * `xxhash64(s, seed)` performs. O(shingles × seeds) primitive ops on a
  * stack min-array, inside whole-stage codegen.
  *
  * Null semantics: NULL array → NULL; a NULL element → NULL (the HOF
  * twin cannot produce one through `concat_ws` shingles). Empty array →
  * NULL (the HOF twin yields an array of per-seed NULL `array_min`s —
  * equally unusable, and unreachable: callers filter `size(toks) >= k`).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  // shape param validated at analysis (clean AnalysisException from SQL)
  // rather than a constructor require — see MinHashBandKeys
  override def checkInputDataTypes(): TypeCheckResult =
    if (numHashes < 1) TypeCheckResult.TypeCheckFailure(
      s"numHashes must be positive, got $numHashes")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val minv = MinHashKernel.minima(input.asInstanceOf[ArrayData], numHashes)
    if (minv == null) null else new GenericArrayData(minv)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // generated code calls the SAME static kernel as the interpreted
      // path (Spark's own XXH64 pattern) — one implementation, no drift
      val kernel = MinHashKernel.getClass.getName.stripSuffix("$")
      val minv = ctx.freshName("minv")
      s"""
         |final long[] $minv = $kernel.minima($a, $numHashes);
         |if ($minv == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($minv);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash LSH band keys over a shingle array (`array<string>` →
  * `array<bigint>` of length `bands`).
  *
  * The unfused pipeline materializes the `numHashes`-long signature per
  * row, then builds each band's bucket key by string-joining the band's
  * signature slice and hashing it (`xxhash64(concat_ws(",",
  * slice(sig, b·rows+1, rows)), b)`) — a UTF8 render of up to 20 digits
  * per hash plus a concat buffer, per (row, band), just to feed bytes to
  * a hash. This expression never leaves primitives: one pass folds every
  * shingle into the running per-seed minima (exactly
  * [[MinHashSignature]]'s kernel), then each band key is the XXH64
  * long-fold of that band's minima, seeded by the band index —
  * `h := b; h := hashLong(minv[j], h)` over the band's rows, the same
  * per-child fold Spark's variadic `xxhash64` applies. No signature
  * array, no strings, whole-stage codegen'd.
  *
  * Collision behavior is what LSH banding needs: equal band slices give
  * equal keys (deterministic fold), and a cross-band collision is
  * excluded by keying the join on (band index, key) — the band index
  * also seeds the fold, so even identical minima in different bands
  * produce unrelated keys.
  *
  * Null semantics match [[MinHashSignature]]: NULL array → NULL, NULL
  * element → NULL, empty array → NULL.
  */
case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  // shape params are validated here, not in a constructor require: from
  // SQL the expression is built during resolution, and analysis turns a
  // TypeCheckFailure into a clean AnalysisException where a require
  // would surface as a raw IllegalArgumentException (ContractSpec)
  override def checkInputDataTypes(): TypeCheckResult =
    if (numHashes < 1) TypeCheckResult.TypeCheckFailure(
      s"numHashes must be positive, got $numHashes")
    else if (bands < 1 || numHashes % bands != 0) TypeCheckResult.TypeCheckFailure(
      s"bands must be positive and divide numHashes, got $bands of $numHashes")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_band_keys"

  override def nullSafeEval(input: Any): Any = {
    val minv = MinHashKernel.minima(input.asInstanceOf[ArrayData], numHashes)
    if (minv == null) null
    else new GenericArrayData(MinHashKernel.bandKeys(minv, bands))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // generated code calls the SAME static kernel as the interpreted
      // path and as MinHashSignature — one implementation, no drift
      val kernel = MinHashKernel.getClass.getName.stripSuffix("$")
      val minv = ctx.freshName("minv")
      s"""
         |final long[] $minv = $kernel.minima($a, $numHashes);
         |if ($minv == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $kernel.bandKeys($minv, $bands));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeys = copy(child = newChild)
}

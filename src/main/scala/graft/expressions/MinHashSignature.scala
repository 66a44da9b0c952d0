package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
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

  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n == 0) return null
    val minv = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (sh.isNullAt(i)) return null
      val base = XXH64.hashUTF8String(sh.getUTF8String(i), 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashInt(j, base)
        if (h < minv(j)) minv(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(minv)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val minv = ctx.freshName("minv")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $minv = new long[$numHashes];
         |  java.util.Arrays.fill($minv, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $base = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      final long $h = $xxh.hashInt($j, $base);
         |      if ($h < $minv[$j]) $minv[$j] = $h;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($minv);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
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

  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
  require(bands >= 1 && numHashes % bands == 0,
    s"bands must be positive and divide numHashes, got $bands of $numHashes")

  private val rows = numHashes / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_band_keys"

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
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var j = b * rows
      while (j < (b + 1) * rows) {
        h = XXH64.hashLong(minv(j), h)
        j += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val minv = ctx.freshName("minv")
      val keys = ctx.freshName("keys")
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
         |    final long[] $keys = new long[$bands];
         |    for (int $b = 0; $b < $bands; $b++) {
         |      long $h = (long) $b;
         |      for (int $j = $b * $rows; $j < ($b + 1) * $rows; $j++) {
         |        $h = $xxh.hashLong($minv[$j], $h);
         |      }
         |      $keys[$b] = $h;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeys = copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing window minima over a hash sequence (`array<bigint>` →
  * `array<bigint>`): for each w-wide window keep its minimum, then
  * distinct preserving first-occurrence order — the fused form of
  * `array_distinct(transform(sequence(0, size(hs) - w),
  *   i => array_min(slice(hs, i + 1, w))))`
  * (the MOSS fingerprint selection, reference use in
  * [[graft.operators.Dedup.winnowFingerprints]]).
  *
  * The HOF chain re-scans each window (`slice` + `array_min` → O(n·w)
  * per document with three interpreted lambdas per window); this kernel
  * is the classic monotonic-deque sliding-window minimum — each element
  * enters and leaves the deque once, so the pass is O(n) regardless of
  * w, and codegen emits one static call per row so the surrounding
  * projection stays in whole-stage codegen.
  *
  * Dedup is an open-addressing long set (no boxing; 0L — a legal hash —
  * is tracked with a flag since it doubles as the empty-slot marker),
  * preserving `array_distinct`'s keep-first-occurrence order so the
  * output is bit- and order-identical to the HOF twin (parity
  * spec-locked).
  *
  * Null semantics: NULL array / NULL element → NULL (upstream
  * [[ShingleHashes]] never emits a null element); fewer than w hashes →
  * empty array (callers guard `size(hs) >= w`, where the HOF twin's
  * `sequence` would error).
  */
case class WinnowMins(child: Expression, w: Int)
    extends UnaryExpression {

  // shape param validated at analysis (clean AnalysisException from SQL)
  // rather than a constructor require — see MinHashBandKeys
  override def checkInputDataTypes(): TypeCheckResult =
    if (w < 1) TypeCheckResult.TypeCheckFailure(
      s"w must be positive, got $w")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_winnow_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowMins.winnow(input.asInstanceOf[ArrayData], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = WinnowMins.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.winnow($a, $w);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowMins = copy(child = newChild)
}

object WinnowMins {

  /** Called once per row from generated code (and from interpreted
    * eval); returns null on a null element. */
  def winnow(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      vals(i) = hs.getLong(i)
      i += 1
    }
    val nWin = n - w + 1
    // monotonic deque of indices: front is the current window's minimum;
    // >= on pop keeps the deque tight (ties carry the same value)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    // open-addressing dedup set over the emitted minima (0L marks an
    // empty slot, so a genuine 0L minimum is tracked via seenZero)
    var cap = java.lang.Integer.highestOneBit(nWin * 2 - 1) << 1
    if (cap < 8) cap = 8
    val mask = cap - 1
    val seen = new Array[Long](cap)
    var seenZero = false
    val out = new Array[Long](nWin)
    var outLen = 0
    i = 0
    while (i < n) {
      while (tail > head && vals(deque(tail - 1)) >= vals(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = vals(deque(head))
        var fresh = false
        if (m == 0L) {
          fresh = !seenZero
          seenZero = true
        } else {
          // xxhash-style finalizer spreads the probe start; linear probe
          var slot = (java.lang.Long.hashCode(m * -7046029254386353131L)) & mask
          while (seen(slot) != 0L && seen(slot) != m)
            slot = (slot + 1) & mask
          fresh = seen(slot) == 0L
          seen(slot) = m
        }
        if (fresh) {
          out(outLen) = m
          outLen += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      if (outLen == out.length) out else java.util.Arrays.copyOf(out, outLen))
  }
}

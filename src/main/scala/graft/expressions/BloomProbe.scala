package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership probe against a CLUSTER-BROADCAST filter
  * (`long → boolean`) — the scale-safe sibling of Spark's
  * `BloomFilterMightContain`.
  *
  * Why not the built-in: `might_contain` takes the filter as a literal
  * or scalar subquery, and either way the serialized BYTES ride the
  * task binary of every stage that references the predicate — visible
  * as "Broadcasting large task binary" warnings at a 1 MB filter and
  * fatal at the multi-GB filters a 10¹⁰-row index needs. This
  * expression holds a `Broadcast[BloomFilter]` HANDLE instead: the
  * task binary carries bytes-worth of reference, executors torrent the
  * filter blocks once each and share one deserialized instance across
  * all their tasks (`Broadcast.value` is executor-memoized).
  *
  * Constructed programmatically only ([[graft.operators.Dedup]]
  * broadcasts the artifact and builds the probe) — a broadcast handle
  * cannot come from SQL text, so unlike the other graft kernels this
  * one is not registered in the function registry. The probe value
  * must be the same `xxhash64(...)` the filter was built over. A null
  * broadcast payload (empty index) probes to null, like the built-in.
  */
case class BloomProbe(bc: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint probe (xxhash64), got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_bloom_probe"

  override def nullSafeEval(input: Any): Any = {
    val f = bc.value
    if (f == null) null
    else java.lang.Boolean.valueOf(f.mightContainLong(input.asInstanceOf[Long]))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // the handle is the codegen reference; the filter itself is fetched
    // and deserialized once per executor, then cached in a field so the
    // per-row path is one virtual call on a local
    val bcRef = ctx.addReferenceObj("graftBloomBc", bc,
      classOf[Broadcast[BloomFilter]].getName)
    val filterField = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();",
      forceInline = true)
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($filterField == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = $filterField.mightContainLong($c);
      |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

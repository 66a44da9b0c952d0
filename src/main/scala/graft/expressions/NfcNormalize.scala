package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (`string` → `string`) — the canonical-
  * composition step of the text-cleaning station: a crawled corpus mixes
  * composed (`é` U+00E9) and decomposed (`e` + U+0301) spellings of the
  * same text, which breaks exact dedup (different bytes, same rendered
  * string), token counting, and vocabulary joins. Spark has no built-in
  * (`java.text.Normalizer` is JDK-standard; DuckDB's `nfc_normalize` is
  * the oracle twin — both implement the same Unicode canonical
  * composition, so outputs are byte-identical).
  *
  * Fast paths keep the common case allocation-free: pure-ASCII inputs
  * (the bulk of a web corpus) are returned as-is without leaving
  * UTF8String, and already-normalized non-ASCII strings (checked via
  * `Normalizer.isNormalized`, a scan without allocation) return the
  * original reference. Codegen emits one static call per row, so the
  * surrounding projection stays in whole-stage codegen.
  *
  * Null semantics: NULL → NULL.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $cls.nfc($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Called once per row from generated code (and interpreted eval). */
  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s // ASCII is NFC by construction
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}

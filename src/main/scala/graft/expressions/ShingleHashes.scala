package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional k-gram hashes over a token array (`array<string>` →
  * `array<bigint>`, length = tokens − k + 1): the fused form of
  * `transform(shingles(toks, k), g => tokenHash(g))`.
  *
  * The HOF chain evaluates three nested lambdas per gram (slice,
  * concat_ws, hash) with interpreted dispatch — on a fingerprinting
  * corpus that is millions of lambda evaluations. This expression
  * builds each gram with one `UTF8String.concatWs` and hashes it in a
  * primitive loop; codegen emits a single static call per row
  * ([[ShingleHashes.hashAll]]), so the surrounding projection stays in
  * whole-stage codegen with no per-element dispatch.
  *
  * Two hash algorithms, matching the existing Column forms bit for bit
  * (parity spec-locked):
  *  - `xx64`: `XXH64.hashUTF8String(gram, 42)` ≡ Spark's `xxhash64(gram)`
  *  - `md5_60`: first 15 hex digits of md5 as a long ≡
  *    `conv(substring(md5(g),1,15),16,10) cast long`
  *    ([[graft.functions.TextOps.md5Hash60]])
  *
  * Null semantics: NULL array / NULL element → NULL; fewer than k
  * tokens → empty array (the HOF twin's `shingles` is guarded by the
  * caller the same way).
  */
case class ShingleHashes(child: Expression, k: Int, algo: String)
    extends UnaryExpression {

  // shape params validated at analysis (clean AnalysisException from SQL)
  // rather than constructor requires — see MinHashBandKeys
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"k must be positive, got $k")
    else if (!ShingleHashes.algos.contains(algo)) TypeCheckResult.TypeCheckFailure(
      s"algo must be one of ${ShingleHashes.algos.mkString("/")}, got $algo")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "graft_shingle_hashes"

  private val algoId = ShingleHashes.algos.indexOf(algo)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashAll(input.asInstanceOf[ArrayData], k, algoId)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.hashAll($a, $k, $algoId);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {

  val algos: Seq[String] = Seq("xx64", "md5_60")

  private val space = UTF8String.fromString(" ")

  private val md5Local =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  /** First 15 hex digits of the md5 digest as an unsigned 60-bit long:
    * big-endian first 8 bytes shifted right one nibble. */
  private def md5Prefix60(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Called once per row from generated code (and from interpreted
    * eval); returns null on a null element. */
  def hashAll(toks: ArrayData, k: Int, algoId: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val grams = new Array[UTF8String](k)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        if (toks.isNullAt(i + j)) return null
        grams(j) = toks.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(space, grams: _*)
      out(i) =
        if (algoId == 0) XXH64.hashUTF8String(gram, 42L)
        else md5Prefix60(gram.getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }
}

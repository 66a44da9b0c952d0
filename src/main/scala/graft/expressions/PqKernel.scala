package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization codebooks — `m` subspaces × `k` codewords of
  * `dsub` dims each (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the FAISS IVF+PQ shape).
  *
  * The memory side of a 100 TB ANN deployment: a 64-dim float64 vector
  * (512 B) encodes to `m` small ints (8 B at m=8, k≤256) — a ~64×
  * postings-payload compression, which is what lets a billion-vector
  * index fit executor memory at serve time. Like [[IvfCentroidSet]]
  * this is a driver-side index-metadata artifact (m×k×dsub doubles —
  * 8×16×8 here, ~8 KB; 8×256×96 in a production fit, ~1.5 MB), carried
  * to executors as a broadcast handle.
  *
  * `checksum` fingerprints the geometry + every codeword byte so a
  * persisted code column can refuse a FOREIGN codebook set at serve
  * time (the [[graft.operators.Similarity.ivfPostings]] centroid-
  * checksum stance: codes assigned under different codebooks are
  * meaningless, fail fast instead of silently mis-ranking).
  */
final case class PqCodebookSet(m: Int, dsub: Int, k: Int,
    codes: Array[Array[Double]]) {
  require(m >= 1 && dsub >= 1 && k >= 1, s"m=$m dsub=$dsub k=$k")
  require(codes.length == m * k,
    s"codes rows ${codes.length} != m*k ${m * k}")
  require(codes.forall(_.length == dsub),
    s"every codeword must have dsub=$dsub dims")

  /** Full vector dimensionality this codebook set encodes. */
  def dim: Int = m * dsub

  /** Codeword `c` of subspace `s` (row-major [m][k]). */
  @inline def codeword(s: Int, c: Int): Array[Double] = codes(s * k + c)

  lazy val checksum: Long = {
    var h = 1125899906842597L // large prime seed
    def mix(v: Long): Unit = { h = 31 * h + v }
    mix(m); mix(dsub); mix(k)
    var r = 0
    while (r < codes.length) {
      val row = codes(r)
      var i = 0
      while (i < row.length) {
        mix(java.lang.Double.doubleToLongBits(row(i))); i += 1
      }
      r += 1
    }
    h
  }
}

/** Shared eval/codegen kernels for the PQ expressions. Every loop runs
  * in ascending index order and every distance is the ascending-j sum
  * of `(x−c)²` — the exact arithmetic the DuckDB oracle's sequential
  * `list_sum(list_transform(...))` performs, so encode argmins
  * (including every tie-break: strict-< scan in ascending code order ≡
  * `row_number() OVER (ORDER BY d2 ASC, code ASC)`) and ADC sums are
  * bit-identical cross-engine before the display rounding. */
object PqKernel {

  /** Subspace-s squared L2 distance between `vec[s·dsub…]` and a
    * codeword, summed in ascending dim order. */
  @inline private def subD2(vec: Array[Double], off: Int,
      cw: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < cw.length) {
      val d = vec(off + j) - cw(j)
      acc += d * d
      j += 1
    }
    acc
  }

  private def unpack(v: ArrayData, dim: Int): Array[Double] = {
    if (v.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      vec(i) = v.getDouble(i)
      i += 1
    }
    vec
  }

  /** Encode one vector: per subspace the argmin codeword id (strict-<
    * over ascending code ids = lowest id wins exact ties). Null when
    * the vector's length differs from the codebook dim or any element
    * is null — such vectors are not encodable, the caller's rank steps
    * drop them (the [[IvfAssignKernel.topCells]] stance). */
  def encode(v: ArrayData, cs: PqCodebookSet): ArrayData = {
    val vec = unpack(v, cs.dim)
    if (vec == null) return null
    val out = new Array[Int](cs.m)
    var s = 0
    while (s < cs.m) {
      val off = s * cs.dsub
      var best = 0.0
      var bestC = -1
      var c = 0
      while (c < cs.k) {
        val d2 = subD2(vec, off, cs.codeword(s, c))
        if (bestC < 0 || d2 < best) { best = d2; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance lookup table for one QUERY vector: m·k doubles,
    * index `s·k + c` = subspace-s distance to codeword c. Computed once
    * per query; every (query, candidate) pair after that is m array
    * lookups instead of a dim-length float scan — the ADC trick that
    * makes PQ serving memory-bound instead of compute-bound. */
  def lut(v: ArrayData, cs: PqCodebookSet): ArrayData = {
    val vec = unpack(v, cs.dim)
    if (vec == null) return null
    val out = new Array[Double](cs.m * cs.k)
    var s = 0
    while (s < cs.m) {
      val off = s * cs.dsub
      var c = 0
      while (c < cs.k) {
        out(s * cs.k + c) = subD2(vec, off, cs.codeword(s, c))
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance: Σ_s lut[s·k + codes(s)], ascending s. Null (boxed)
    * on a null element, an out-of-range code, or a lut whose length is
    * not a multiple of k × codes-length — mismatched artifacts must
    * surface as dropped rows, not garbage distances. */
  def adc(lut: ArrayData, codes: ArrayData, k: Int): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * k) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= k) return null
      // null-check the slot actually read (s·k+c), not slot s — a null
      // lut element beyond index m would otherwise contribute 0.0 and
      // silently mis-rank instead of dropping the row
      if (lut.isNullAt(s * k + c)) return null
      acc += lut.getDouble(s * k + c)
      s += 1
    }
    acc
  }
}

/** `array<double> → array<int>` PQ encode against a cluster-broadcast
  * codebook set. Programmatic-only (a broadcast handle cannot come from
  * SQL text — the [[BloomProbe]]/[[IvfNearestCells]] stance); the
  * codebooks deserialize once per executor into a codegen field. */
case class PqEncode(bc: Broadcast[PqCodebookSet], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], bc.value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftPqCodebooksBc", bc,
      classOf[Broadcast[PqCodebookSet]].getName)
    val csClass = classOf[PqCodebookSet].getName
    val csField = ctx.addMutableState(csClass, "graftPqCodebooks",
      v => s"$v = ($csClass) $bcRef.value();", forceInline = true)
    val kernel = PqKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = $kernel.encode($v, $csField);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `array<double> → array<double>` ADC lookup table (m·k subspace
  * distances) for a QUERY vector. Programmatic-only, same broadcast
  * stance as [[PqEncode]]. */
case class PqLut(bc: Broadcast[PqCodebookSet], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(v: Any): Any =
    PqKernel.lut(v.asInstanceOf[ArrayData], bc.value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftPqCodebooksBc", bc,
      classOf[Broadcast[PqCodebookSet]].getName)
    val csClass = classOf[PqCodebookSet].getName
    val csField = ctx.addMutableState(csClass, "graftPqCodebooks",
      v => s"$v = ($csClass) $bcRef.value();", forceInline = true)
    val kernel = PqKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = $kernel.lut($v, $csField);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `(array<double> lut, array<int> codes) → double` asymmetric PQ
  * distance — the per-pair hot path of a PQ serve: m array lookups, no
  * vector arithmetic. `k` (codes per subspace) is a literal shape arg;
  * SQL-registered as `graft_pq_adc(lut, codes, k)` since both inputs
  * are plain columns. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  // shape validation lives here, not in a constructor require — an
  // invalid SQL literal must FAIL ANALYSIS (clean AnalysisException),
  // not construction (the house rule for every shape-arg kernel)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1 codewords per subspace, got $k")
    else (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(lutV: Any, codesV: Any): Any =
    PqKernel.adc(lutV.asInstanceOf[ArrayData],
      codesV.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = PqKernel.getClass.getName.stripSuffix("$")
    val r = ctx.freshName("pqAdc")
    nullSafeCodeGen(ctx, ev, (lutV, codesV) => s"""
      |java.lang.Double $r = $kernel.adc($lutV, $codesV, $k);
      |${ev.isNull} = ($r == null);
      |${ev.value} = ${ev.isNull} ? -1.0 : $r.doubleValue();
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

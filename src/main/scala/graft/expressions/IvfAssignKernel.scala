package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** The broadcastable IVF coarse-quantizer payload: the centroid matrix
  * plus each centroid's self-dot `cn2`, precomputed ONCE driver-side in
  * index order — the same summation order as
  * [[ArrayDotProduct]], so `cn2(c)` is bit-identical to the
  * `dot(centroid, centroid)` column the DataFrame assignment path
  * computes (the d2 values, and therefore every assignment tie-break,
  * agree exactly between the two routes).
  *
  * At production cell counts the matrix is megabytes (2¹² cells × 64
  * dims × 8 B ≈ 2 MB), which is why [[IvfNearestCells]] carries it as a
  * `Broadcast` HANDLE rather than a plan literal — same stance as
  * [[BloomProbe]]: the task binary stays bytes-sized and executors
  * torrent the matrix once each.
  */
final case class IvfCentroidSet(cents: Array[Array[Double]], cn2: Array[Double]) {
  require(cents.nonEmpty, "empty centroid set")
  require(cents.length == cn2.length, "cents/cn2 length mismatch")
  def numCells: Int = cents.length
  def dim: Int = cents(0).length
}

object IvfAssignKernel {

  /** Build the payload from a centroid matrix (cell id = row index —
    * the same contract as `Similarity.centroidTable`). */
  def centroidSet(cents: Array[Array[Double]]): IvfCentroidSet = {
    val cn2 = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var s = 0.0
      var i = 0
      while (i < cent.length) { s += cent(i) * cent(i); i += 1 }
      cn2(c) = s
      c += 1
    }
    IvfCentroidSet(cents, cn2)
  }

  /** The `m` nearest cells of one vector, ordered by (d2 asc, cell asc)
    * — element 0 is the home cell. One O(cells × dim) scan per row with
    * a bounded insertion buffer (m ≤ probes, never the cell count), so
    * the caller's plan carries NO per-cell row expansion: the
    * N×cells intermediate the window-ranked assignment materializes
    * (fatal at 2¹²⁺ cells — see `Similarity.ivfTopKLarge`) never
    * exists.
    *
    * d2 per (v, cell) is `nrm² + cn2 − 2·⟨v,c⟩` with ⟨v,c⟩ summed in
    * index order — bit-identical to the DataFrame formula, which is
    * what makes the large route digest-equal to the oracle-exact one.
    * Returns null when the vector's length differs from the centroid
    * dim or any element is null (the DataFrame path yields null d2
    * there; such vectors are not assignable under either route).
    */
  def topCells(v: ArrayData, nrm: Double, cs: IvfCentroidSet,
      m: Int): ArrayData = {
    val dim = cs.dim
    if (v.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      vec(i) = v.getDouble(i)
      i += 1
    }
    val nCells = cs.numCells
    val keep = math.min(m, nCells)
    val nv2 = nrm * nrm
    val bestD = new Array[Double](keep)
    val bestC = new Array[Int](keep)
    var filled = 0
    var c = 0
    while (c < nCells) {
      val cent = cs.cents(c)
      var dp = 0.0
      i = 0
      while (i < dim) { dp += vec(i) * cent(i); i += 1 }
      val d2 = nv2 + cs.cn2(c) - 2.0 * dp
      // strict-< insertion while scanning cells in ascending order =
      // the (d2 asc, cell asc) tie-break of the row_number route
      if (filled < keep || d2 < bestD(filled - 1)) {
        var p = if (filled < keep) filled else keep - 1
        while (p > 0 && d2 < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = d2
        bestC(p) = c
        if (filled < keep) filled += 1
      }
      c += 1
    }
    val rows = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      rows(r) = new GenericInternalRow(
        Array[Any](bestC(r), bestD(r))): InternalRow
      r += 1
    }
    new GenericArrayData(rows)
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData

/** The one MinHash minima kernel shared by [[MinHashSignature]] and
  * [[MinHashBandKeys]] — interpreted eval AND generated code both call
  * these statics (the same pattern Spark uses for `XXH64` itself), so
  * the two expressions cannot drift apart: any change to the hash seed,
  * null handling, or fold shape lands in exactly one place and the
  * parity specs re-prove both callers.
  *
  * Kernel: each shingle is xxhash64'd ONCE (`hashUTF8String(s, 42)` —
  * Spark's own kernel, bit-identical to `xxhash64(s)`), then the
  * per-seed variation reuses that base via `hashInt(seed, base)`,
  * exactly the fold Spark's two-child `xxhash64(s, seed)` performs.
  */
object MinHashKernel {

  /** Per-seed minima over a shingle array, or null for an empty array or
    * any null element (the callers' documented null semantics). */
  def minima(sh: ArrayData, numHashes: Int): Array[Long] = {
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
    minv
  }

  /** Per-band bucket keys from a signature: band b's key is the XXH64
    * long-fold of its `rows` minima, seeded by the band index (the same
    * per-child fold Spark's variadic `xxhash64` applies). */
  def bandKeys(minv: Array[Long], bands: Int): Array[Long] = {
    val rows = minv.length / bands
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
    keys
  }
}

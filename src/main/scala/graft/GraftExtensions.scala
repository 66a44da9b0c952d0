package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{ArrayDotProduct, MinHashBandKeys, MinHashSignature, NfcNormalize, ShingleHashes, SimHashPacked, WinnowMins}

/** `SparkSessionExtensions` hook registering graft's native expressions
  * as SQL functions — enable cluster-wide with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, after which
  * `SELECT graft_dot(a, b)` resolves in plain Spark SQL.
  *
  * The DataFrame API (`graft.functions.VectorOps.dot`) builds the same
  * expression directly and needs no registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Shape parameters (signature width, band count, hash algo) must be
    * literals — they size the generated code, so a per-row value cannot
    * work. Any foldable integral that fits an Int is accepted (SQL
    * literals arrive as INT, but `32L` or a CAST arrives as BIGINT /
    * SMALLINT / TINYINT and is no less foldable); a non-foldable,
    * fractional, out-of-Int-range, or NULL argument gets the standard
    * NON_FOLDABLE_ARGUMENT AnalysisException instead of an NPE at
    * resolution time. */
  private def foldableInt(fn: String, param: String, e: Expression): Int = {
    val v = if (e.foldable) e.eval(null) else null
    v match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case _ => throw GraftColumnBridge.nonFoldableArgument(fn, param,
        org.apache.spark.sql.types.IntegerType)
    }
  }

  private def foldableString(fn: String, param: String, e: Expression): String = {
    val v = if (e.foldable) e.eval(null) else null
    if (v == null) throw GraftColumnBridge.nonFoldableArgument(fn, param,
      org.apache.spark.sql.types.StringType)
    v.toString
  }

  /** Wrong argument counts get the standard WRONG_NUM_ARGS
    * AnalysisException instead of a raw IndexOutOfBounds at
    * resolution. */
  private def requireArity(fn: String, children: Seq[Expression],
      allowed: Seq[Int]): Unit =
    if (!allowed.contains(children.size))
      throw GraftColumnBridge.wrongNumArgs(fn, allowed, children.size)

  /** (name, info, builder) triples for every native graft expression. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => {
          requireArity("graft_dot", children, Seq(2))
          ArrayDotProduct(children(0), children(1))
        }),
      // graft_simhash(hashes array<bigint>[, bits int]) — bits must be a
      // foldable int literal (it shapes the generated loop)
      (FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[SimHashPacked].getName, "graft_simhash"),
        (children: Seq[Expression]) => {
          requireArity("graft_simhash", children, Seq(1, 2))
          val bits = children.lift(1)
            .map(foldableInt("graft_simhash", "bits", _)).getOrElse(64)
          SimHashPacked(children.head, bits)
        }),
      // graft_minhash(shingles array<string>, numHashes int) — numHashes
      // must be a foldable int literal (it sizes the signature)
      (FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
        (children: Seq[Expression]) => {
          requireArity("graft_minhash", children, Seq(2))
          MinHashSignature(children.head,
            foldableInt("graft_minhash", "numHashes", children(1)))
        }),
      // graft_minhash_band_keys(shingles array<string>, numHashes int,
      // bands int) — both shape args must be foldable int literals
      (FunctionIdentifier("graft_minhash_band_keys"),
        new ExpressionInfo(classOf[MinHashBandKeys].getName,
          "graft_minhash_band_keys"),
        (children: Seq[Expression]) => {
          requireArity("graft_minhash_band_keys", children, Seq(3))
          MinHashBandKeys(children.head,
            foldableInt("graft_minhash_band_keys", "numHashes", children(1)),
            foldableInt("graft_minhash_band_keys", "bands", children(2)))
        }),
      // graft_shingle_hashes(toks array<string>, k int[, algo string])
      (FunctionIdentifier("graft_shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
        (children: Seq[Expression]) => {
          requireArity("graft_shingle_hashes", children, Seq(2, 3))
          ShingleHashes(children.head,
            foldableInt("graft_shingle_hashes", "k", children(1)),
            children.lift(2)
              .map(foldableString("graft_shingle_hashes", "algo", _))
              .getOrElse("xx64"))
        }),
      // graft_winnow_mins(hashes array<bigint>, w int) — w must be a
      // foldable int literal (it shapes the window loop)
      (FunctionIdentifier("graft_winnow_mins"),
        new ExpressionInfo(classOf[WinnowMins].getName, "graft_winnow_mins"),
        (children: Seq[Expression]) => {
          requireArity("graft_winnow_mins", children, Seq(2))
          WinnowMins(children.head,
            foldableInt("graft_winnow_mins", "w", children(1)))
        }),
      // graft_nfc(text string) — Unicode NFC canonical composition
      (FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
        (children: Seq[Expression]) => {
          requireArity("graft_nfc", children, Seq(1))
          NfcNormalize(children.head)
        }),
      // graft_pq_adc(lut array<double>, codes array<int>, k int) —
      // asymmetric PQ distance (k = codes per subspace must be a
      // foldable int literal: it shapes the lookup stride)
      (FunctionIdentifier("graft_pq_adc"),
        new ExpressionInfo(classOf[graft.expressions.PqAdc].getName,
          "graft_pq_adc"),
        (children: Seq[Expression]) => {
          requireArity("graft_pq_adc", children, Seq(3))
          graft.expressions.PqAdc(children(0), children(1),
            foldableInt("graft_pq_adc", "k", children(2)))
        }),
      // graft_topk(score double, id bigint, k int) — bounded-heap top-k
      // aggregate (k must be a foldable int literal: it sizes the heap)
      (FunctionIdentifier("graft_topk"),
        new ExpressionInfo(classOf[graft.expressions.TopKByScore].getName,
          "graft_topk"),
        (children: Seq[Expression]) => {
          requireArity("graft_topk", children, Seq(3))
          graft.expressions.TopKByScore(children(0), children(1),
            foldableInt("graft_topk", "k", children(2)))
        }))

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      GraftColumnBridge.registerFunction(spark, id.funcName, info, builder)
    }
}

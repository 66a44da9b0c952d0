package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Primitive bounded top-k heap over (score: Double, id: Long) pairs,
  * best = (score DESC, id ASC). A binary MIN-heap on that order — the
  * root is the WORST kept pair — so a streaming candidate costs one
  * root compare when the heap is full (the overwhelmingly common case:
  * k ≪ candidates) and log k only when it actually displaces. Two flat
  * primitive arrays, no boxing, no per-insert allocation — this runs
  * once per (query, candidate) pair, the innermost loop of every
  * similarity serve. */
final class TopKScores(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** (s1,i1) ranks strictly WORSE than (s2,i2) under (score desc, id
    * asc). NaN never enters the heap ([[add]] rejects it), so < / ==
    * are total here. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  /** NaN scores are REJECTED here, not just filtered upstream: a
    * zero-norm embedding makes cosine 0/0 = NaN (not null), and a NaN
    * inside the heap is poison — `worse` is false for every NaN
    * comparison, so a NaN at the min-root could never be displaced and
    * the group's top-k would silently freeze at the first k rows
    * scanned (the row_number window this aggregate replaced at least
    * ordered NaN deterministically). Rejecting at the single entry
    * point covers update, merge, AND deserialize. */
  def add(s: Double, id: Long): Unit =
    if (s != s) () // NaN: non-comparable candidate, skipped like null
    else if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      var i = size - 1
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (l + 1 < size && worse(scores(l + 1), ids(l + 1), scores(m), ids(m)))
          m = l + 1
        if (m == i) done = true
        else { swap(i, m); i = m }
      }
    }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def mergeIn(o: TopKScores): Unit = {
    var i = 0
    while (i < o.size) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Kept pairs as index arrays sorted best-first (score desc, id asc). */
  def sortedDesc: Array[Int] =
    Array.range(0, size).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
}

/** `graft_topk(score, id, k)` — bounded-heap top-k AGGREGATE: per
  * group, the k best (score DESC, id ASC) pairs as
  * `array<struct<sim double, id bigint>>` sorted best-first.
  *
  * The scale story (and the reason the similarity family's rank step
  * is this aggregate, not `row_number() OVER (PARTITION BY query)`):
  * the window form shuffles EVERY candidate row to its query's
  * partition and SORTS whole partitions — at the sf30 brute-force
  * truth that is 1.2 × 10⁹ rows through one exchange and a 30-minute
  * sort straggler, and the sorted bytes grow with candidates, not with
  * answers. The aggregate keeps a k-element heap per query and — being
  * a proper AggregateFunction — gets MAP-SIDE PARTIAL merges for free:
  * each map task emits at most queries×k pairs, the exchange carries
  * ~queries×k×maps rows, and nothing is ever globally sorted (the
  * per-group eval sorts k elements). Same rows out, candidates-bounded
  * work replaced by answers-bounded work.
  *
  * Null or NaN score, or null id = a non-comparable candidate —
  * skipped (the SQL-function form; the DataFrame routes additionally
  * filter them so plans show the intent — NaN arises from zero-norm
  * vectors, where cosine is 0/0). Ties on score break to the LOWER
  * id, matching every other deterministic tiebreak in the engine. */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScores] with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 1, got $k")
    else (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got " +
          s"(${s.simpleString(10)}, ${i.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKScores = new TopKScores(k)

  override def update(b: TopKScores, input: InternalRow): TopKScores = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKScores, o: TopKScores): TopKScores = {
    b.mergeIn(o); b
  }

  override def eval(b: TopKScores): Any =
    new GenericArrayData(b.sortedDesc.map { i =>
      InternalRow(b.scores(i), b.ids(i)): Any
    })

  override def serialize(b: TopKScores): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 16 * b.size)
    buf.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKScores = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKScores(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) {
      val s = buf.getDouble(); val id = buf.getLong()
      b.add(s, id)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}

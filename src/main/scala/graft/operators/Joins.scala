package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join helpers for skew that AQE can't fix on its own (SURVEY §7.2
  * slice 5).
  *
  * AQE's skew-join split handles moderately hot keys by splitting
  * oversized shuffle partitions, but a single key whose rows dwarf every
  * split threshold — the "one nct_id with half the fact table" shape —
  * still lands on one task. Salting is the authored mitigation: spread
  * the hot key's rows over `salt` synthetic sub-keys and replicate the
  * (small) other side across all of them.
  */
object Joins {

  /** Salted fact⋈dim equi-join on `key`: fact rows scatter uniformly
    * over `salt` sub-keys (seeded `rand` — deterministic per run,
    * including task retries, which re-execute the same partition with
    * the same seed stream); the dim side replicates `salt`× via explode.
    * Result rows equal the plain join exactly — only the shuffle
    * distribution changes: a hot key's probe rows now hash to `salt`
    * distinct (key, salt) shuffle keys instead of one.
    *
    * Use for fact⋈fact skew where the "dim" is too big to broadcast but
    * small enough that `salt`× replication is cheap; for true dims
    * prefer `broadcast()` (no shuffle at all). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedFact = fact.withColumn("__salt",
      floor(rand(seed) * salt).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("__salt") === saltedDim("__salt"),
        joinType)
      .drop(saltedDim(key)).drop(saltedFact("__salt")).drop(saltedDim("__salt"))
  }

  /** As-of (left) join: for each left row, the LATEST right row with
    * `right.time <= left.time` on the same key — the operator behind
    * point-in-time feature lookup and attribution, which Spark has no
    * built-in for.
    *
    * A naive non-equi join (`l.key = r.key AND r.time <= l.time` +
    * keep-latest) fans |left per key| × |right per key| rows per key
    * before ranking — quadratic per key, dead at corpus scale. This
    * implementation is the union trick: tag and union both inputs, sort
    * each key's timeline once, and carry the right payload forward with
    * `last(_, ignoreNulls)` over the ordered window. ONE shuffle on the
    * key, O(n log n) per key, no fan-out. Right rows at exactly
    * left.time are visible (ASOF `>=` semantics — right sorts before
    * left on ties via the tag).
    *
    * Output: every left row + each payload column as `asof_<name>`
    * (NULL when no right row precedes). Caller contract: (key, time)
    * must be unique on the right (pre-aggregate otherwise — ties there
    * would be nondeterministic in ANY as-of implementation). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String]): DataFrame = {
    val l = left.withColumn("__src", lit(1))
    val r0 = right.select((key +: time +: rightPayload).map(col): _*)
    val r = rightPayload.foldLeft(r0) { (d, c) =>
      d.withColumnRenamed(c, s"asof_$c")
    }.withColumn("__src", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__src") === 1).drop("__src")
  }

  /** Range (interval containment) join: left rows matched to every
    * interval of the same key with `start <= time <= end`.
    *
    * Spark plans a raw `l.key = r.key AND l.time BETWEEN r.start AND
    * r.end` as an equi-join on key with the range as a post-filter —
    * every (row, interval) pair of a key meets before filtering,
    * quadratic per key. This implementation buckets time into
    * `binSeconds` bins: intervals explode into their covered bins
    * (span/binSeconds + 1 rows — bounded when spans are), rows carry
    * their single bin, and the join runs on (key, bin) with the exact
    * range check as a residual. Join fan per key = rows × intervals
    * SHARING A BIN, not all pairs. A row meets an interval in exactly
    * one bin (its own), so no dedup is needed.
    *
    * Pick binSeconds ≈ the typical interval span: too small explodes
    * the interval side, too large degrades toward the naive join.
    * Caller contract: column names of `left` and `intervals` must be
    * disjoint apart from `key`. */
  def rangeJoin(left: DataFrame, intervals: DataFrame, key: String,
      time: String, start: String, end: String,
      binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val shared = (left.columns.toSet & intervals.columns.toSet) - key
    require(shared.isEmpty,
      s"rangeJoin requires left/interval column names disjoint apart from " +
        s"'$key'; shared: ${shared.toSeq.sorted.mkString(", ")}")
    val binUs = binSeconds * 1000000L
    def binOf(c: String) =
      floor(unix_micros(col(c).cast("timestamp")) / binUs)
    val l = left.withColumn("__bin", binOf(time))
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(start), binOf(end))))
    l.join(iv,
        l("__bin") === iv("__bin") && l(key) === iv(key) &&
          col(time) >= col(start) && col(time) <= col(end))
      .drop(iv(key)).drop(l("__bin")).drop(iv("__bin"))
  }
}

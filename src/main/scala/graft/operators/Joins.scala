package graft.operators

import org.apache.spark.sql.DataFrame
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
}

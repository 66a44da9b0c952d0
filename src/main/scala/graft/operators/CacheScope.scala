package graft.operators

import scala.collection.mutable
import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Scoped lifecycle for the operators' internal persists.
  *
  * Dedup/Similarity pipelines persist intermediates that feed several
  * consumers of one returned plan (shingle arrays, signatures, prepared
  * corpora). Those frames go out of scope when the operator returns, and
  * Spark's ContextCleaner eventually reclaims the blocks — but "eventually"
  * is GC-driven, so a library user composing many operators in one session
  * (q20 + q21 + q33 back to back) accumulates MEMORY_AND_DISK blocks and
  * leans on executor-memory eviction in the meantime. At cluster scale
  * that eviction pressure lands on unrelated jobs sharing the executors.
  *
  * [[withCachesReleased]] bounds the lifetime deterministically: every
  * persist an operator takes while the scope is open (operators route
  * theirs through [[CacheScope.persist]]) is unpersisted the moment the
  * scope closes — build the frame AND run its action inside the scope:
  *
  * {{{
  * val pairs = CacheScope.withCachesReleased {
  *   Dedup.minhashLsh(docs, k = 5, numHashes = 32, bands = 8, 0.4).collect()
  * }
  * }}}
  *
  * Outside any scope, `persist` degrades to today's behavior (persist and
  * let the ContextCleaner reclaim) — existing callers are untouched.
  * Scopes nest; each releases only its own registrations.
  *
  * Scope membership is thread-local (a frame joins the scope open on the
  * thread that BUILT it — Spark's job threads only materialize frames, so
  * a persist taken on a job thread sees no scope and degrades to the
  * ContextCleaner path). Ownership, however, is global: the CacheManager
  * dedupes persists of `sameResult` plans session-wide, so two scopes on
  * different threads persisting identical plans share ONE cache entry.
  * Registrations are therefore refcounted on the canonicalized plan — the
  * same identity the CacheManager dedupes on — and the entry is
  * unpersisted only when the LAST scope holding it exits, never mid-query
  * under a concurrent scope (ContractSpec pins the overlap).
  */
object CacheScope {

  private val stack = new ThreadLocal[List[ListBuffer[(LogicalPlan, DataFrame)]]] {
    override def initialValue(): List[ListBuffer[(LogicalPlan, DataFrame)]] = Nil
  }

  /** Canonicalized plan → number of open scopes (across all threads)
    * holding a registration for it. Guarded by its own monitor; persist
    * setup is operator-launch-time work, so contention is nil. */
  private val owned = mutable.Map.empty[LogicalPlan, Int]

  /** Persist MEMORY_AND_DISK and register with the innermost open scope
    * (no-op registration when no scope is open). A plan the CacheManager
    * already holds for someone OUTSIDE every scope — e.g. an identical
    * frame persisted by the caller before the scope opened — is NOT
    * registered: Spark dedupes the persist onto the existing entry, and
    * unpersisting it at scope exit would silently evict the caller's
    * still-live cache. A plan held by another OPEN scope is registered
    * with its refcount bumped instead, so whichever scope exits last
    * releases the shared entry. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    stack.get() match {
      case Nil => df.persist(StorageLevel.MEMORY_AND_DISK)
      case top :: _ =>
        val key = org.apache.spark.sql.GraftColumnBridge.canonicalizedPlan(df)
        owned.synchronized {
          val scopeRefs = owned.getOrElse(key, 0)
          val callerOwned = scopeRefs == 0 &&
            org.apache.spark.sql.GraftColumnBridge.isCached(df)
          df.persist(StorageLevel.MEMORY_AND_DISK)
          if (!callerOwned) {
            owned.update(key, scopeRefs + 1)
            top += ((key, df))
          }
        }
    }
    df
  }

  /** [[persist]] + immediate materialization (one `count()` action).
    *
    * For a persisted frame consumed by SEVERAL independent stages of one
    * downstream query, lazy caching has a thundering-herd seam: AQE
    * materializes independent shuffle stages CONCURRENTLY, every one of
    * them finds the cached partitions absent, and each recomputes the
    * full producing lineage (the block store does not lock in-flight
    * partition computes — last writer wins). Measured on q20/q42/q72:
    * SIX concurrent single-task jobs each re-running the whole
    * tokenize+shingle pipeline (0.5–1.5 s apiece, plus the GC debt of
    * 6× the allocation landing on the stages that follow). Paying one
    * up-front count pins the cache ONCE; every consumer then scans
    * CachedBatches. Use for fan-out intermediates (several consumers in
    * one plan or an iterative loop); plain [[persist]] stays right for
    * single-consumer reuse across sequential actions, where the first
    * action populates without a race. */
  private[graft] def persistEager(df: DataFrame): DataFrame = {
    val p = persist(df)
    p.count()
    p
  }

  /** Run `f`, then release every operator-internal frame persisted during
    * it whose refcount this scope held last. Unpersist is idempotent, so
    * operators that already clean up after themselves (dedupClusters) are
    * unaffected. */
  def withCachesReleased[T](f: => T): T = {
    val buf = ListBuffer.empty[(LogicalPlan, DataFrame)]
    stack.set(buf :: stack.get())
    try f
    finally {
      stack.set(stack.get().tail)
      owned.synchronized {
        buf.foreach { case (key, df) =>
          owned.getOrElse(key, 1) - 1 match {
            case n if n <= 0 =>
              owned.remove(key)
              df.unpersist(blocking = false)
            case n => owned.update(key, n)
          }
        }
      }
    }
  }
}

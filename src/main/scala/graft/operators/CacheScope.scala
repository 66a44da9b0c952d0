package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
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
  * Scopes nest; each releases only its own registrations. Registration is
  * thread-local (frames are built on the calling thread; Spark's job
  * threads only materialize them).
  */
object CacheScope {

  private val stack = new ThreadLocal[List[ListBuffer[DataFrame]]] {
    override def initialValue(): List[ListBuffer[DataFrame]] = Nil
  }

  /** Persist MEMORY_AND_DISK and register with the innermost open scope
    * (no-op registration when no scope is open). A plan the CacheManager
    * already holds — e.g. an identical frame persisted by the CALLER
    * before the scope opened — is NOT registered: Spark dedupes the
    * persist onto the existing entry, and unpersisting it at scope exit
    * would silently evict the caller's still-live cache. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val preowned = org.apache.spark.sql.GraftColumnBridge.isCached(df)
    df.persist(StorageLevel.MEMORY_AND_DISK)
    if (!preowned) stack.get() match {
      case top :: _ => top += df
      case Nil      => ()
    }
    df
  }

  /** Run `f`, then unpersist every operator-internal frame persisted
    * during it. Unpersist is idempotent, so operators that already clean
    * up after themselves (dedupClusters) are unaffected. */
  def withCachesReleased[T](f: => T): T = {
    val buf = ListBuffer.empty[DataFrame]
    stack.set(buf :: stack.get())
    try f
    finally {
      stack.set(stack.get().tail)
      buf.foreach(_.unpersist(blocking = false))
    }
  }
}

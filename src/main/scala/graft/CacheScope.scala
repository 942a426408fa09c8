package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifecycle for the slim frames graft operators cache
  * (VERDICT r3 #7).
  *
  * Several operators cache small intermediate frames because they are
  * consumed by multiple plan branches — the (id, signature) tables in
  * [[operators.Dedup]]/[[operators.Similarity]], the double-cast
  * vector table in [[queries.Ann]], q52's trained centroids. The cache
  * is correct (it is what makes the self-joins read materialized
  * signatures instead of recomputing sketches per side), but it is
  * created per invocation: a library user running these repeatedly in
  * one session would accumulate dead caches. `graft.Bench`/`Verify`
  * clear between queries; this gives library users the same hygiene:
  *
  * {{{
  * CacheScope.withCacheScope {
  *   Dedup.minHashCandidates(sigs, "doc_id", 16, 2).count()
  * } // every graft-tracked cache created inside is unpersisted here
  * }}}
  *
  * Operators route their caches through [[trackedCache]]; the registry
  * holds only graft-created caches, so a scope never touches the
  * caller's own persisted data (unlike `spark.catalog.clearCache()`).
  * `unpersist` goes through the Dataset API, which also drops the
  * CacheManager plan entry — not just the storage blocks.
  */
object CacheScope {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  // Scope membership is tracked per THREAD and by IDENTITY, never by
  // registry index: the registry compacts itself whenever entries go
  // dead (spark.catalog.clearCache(), manual unpersist), so an index
  // mark taken at scope entry can point past entries created inside the
  // scope — and a concurrent thread's caches must not be swept up by
  // this thread's scope exit.
  private val scopes =
    ThreadLocal.withInitial[List[scala.collection.mutable.ArrayBuffer[DataFrame]]](() => Nil)

  /** Cache `df` and register it for scope/`releaseAll` cleanup. */
  private[graft] def trackedCache(df: DataFrame): DataFrame = {
    df.cache()
    synchronized {
      // drop entries a scope (or a manual unpersist) already released
      tracked.filterInPlace(_.storageLevel != StorageLevel.NONE)
      tracked += df
    }
    scopes.get() match {
      case innermost :: _ => innermost += df
      case Nil =>
    }
    df
  }

  /** Run `body`; on exit unpersist every graft cache created inside —
    * exactly the frames this thread's `trackedCache` calls recorded,
    * regardless of what the shared registry did meanwhile.
    */
  def withCacheScope[T](body: => T): T = {
    val mine = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    scopes.set(mine :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      mine.foreach(_.unpersist(blocking = false))
      synchronized { tracked.filterInPlace(f => !mine.exists(_ eq f)) }
    }
  }

  /** Unpersist every live graft-tracked cache (session-wide sweep). */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}

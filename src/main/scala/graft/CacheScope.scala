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

  /** Cache `df` and register it for scope/`releaseAll` cleanup. */
  private[graft] def trackedCache(df: DataFrame): DataFrame = synchronized {
    // drop entries a scope (or a manual unpersist) already released
    tracked.filterInPlace(_.storageLevel != StorageLevel.NONE)
    tracked += df.cache()
    df
  }

  /** Run `body`; on exit unpersist every graft cache created inside. */
  def withCacheScope[T](body: => T): T = {
    val mark = synchronized(tracked.length)
    try body
    finally synchronized {
      tracked.drop(mark).foreach(_.unpersist(blocking = false))
      tracked.remove(mark, tracked.length - mark)
    }
  }

  /** Unpersist every live graft-tracked cache (session-wide sweep). */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracked persistence for operator intermediates.
  *
  * The pair-generation operators (`minhashDedupPairs`,
  * `incrementalDedupPairs`, `simhashPairs`, `nearDupPairsLsh`,
  * `verifyNearDupCandidates`) persist intermediates that BOTH sides of
  * a self-join (or a downstream rescore) re-read — recomputing them
  * doubles the dominant scan. Those frames feed the lazily-returned
  * result, so the operator itself cannot unpersist them; in library use
  * each invocation would otherwise pin MEMORY_AND_DISK blocks until the
  * caller happened to clear the whole SQL cache.
  *
  * This registry makes the contract explicit: operators persist through
  * [[Caches.persist]], and callers release everything tracked with
  * [[Caches.release]] after the consuming action (a query harness does
  * it between queries; `spark.catalog.clearCache()` remains the
  * blunt equivalent). Release is idempotent and safe mid-stream — an
  * unpersisted frame silently recomputes if re-used. */
object Caches {

  // WEAK-reference tracking (both sets): the registry must never be
  // the thing that keeps a block alive. A library caller that drops
  // its frame without ever calling release() leaves the entry
  // collectable, so Spark's ContextCleaner GC fallback can still
  // reclaim the MEMORY_AND_DISK blocks — with strong refs here, an
  // unreleased localCheckpoint RDD was pinned FOREVER (the registry
  // disabled the very fallback that reclaimed bare localCheckpoints
  // before it existed). WeakHashMap is not thread-safe, so access is
  // synchronized on the set itself ([[release]] copies under the
  // lock, unpersists outside it).
  private val tracked = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[DataFrame, java.lang.Boolean]()))

  /** Persist `df` at MEMORY_AND_DISK and track it for [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df
  }

  private val trackedRdds = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_],
        java.lang.Boolean]()))

  /** Eagerly `localCheckpoint()` `df` (lineage truncation — deep
    * composed plans stop re-optimizing per downstream stage) and track
    * the checkpoint RDD's blocks for [[release]]. Unlike [[persist]]ed
    * frames, a checkpointed frame CANNOT recompute after release
    * (lineage is gone — that is the point), so only use this on
    * frames fully consumed before the releasing boundary; repeated
    * query/bench iterations then return the MEMORY_AND_DISK blocks
    * instead of accumulating them until the ContextCleaner notices. */
  def checkpoint(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    org.apache.spark.sql.graft.shim.leafRdds(out).foreach(trackedRdds.add)
    out
  }

  /** Unpersist (non-blocking) every tracked intermediate. Entries are
    * drained under the set's lock (synchronized-set iteration is not
    * safe without it), then unpersisted outside it. */
  def release(): Unit = {
    val dfs = tracked.synchronized {
      val c = new java.util.ArrayList[DataFrame](tracked)
      tracked.clear(); c
    }
    dfs.forEach(_.unpersist(false))
    val rdds = trackedRdds.synchronized {
      val c = new java.util.ArrayList[org.apache.spark.rdd.RDD[_]](trackedRdds)
      trackedRdds.clear(); c
    }
    rdds.forEach(_.unpersist(false))
  }

  /** Number of currently-tracked intermediates (test hook). */
  def trackedCount: Int = tracked.size() + trackedRdds.size()
}

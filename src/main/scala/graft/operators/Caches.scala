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

  // STRONG refs for persisted DataFrames — deliberately, and unlike
  // [[trackedRdds]] below: `df.persist()` registers the plan in
  // Spark's CacheManager, which holds it strongly until an explicit
  // unpersist, so a weak entry here frees NOTHING — it only lets the
  // registry forget a GC'd frame object, after which release() can
  // never unpersist it and the orphaned CacheManager entry SHADOWS
  // later scans of the same path with a stale file listing (a fresh
  // `spark.read.parquet(p)` after an append is silently served the
  // pre-append snapshot — a correctness hazard, observed as a stale
  // containment index in the ingest-loop spec). The registry must
  // therefore outlive the caller's reference: every persist is
  // releasable exactly once, by release().
  private val tracked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist `df` at MEMORY_AND_DISK and track it for [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df
  }

  // WEAK refs for checkpoint-block RDDs (the r9 advisory): unlike a
  // persisted DataFrame there is no CacheManager entry — the blocks
  // belong to the RDD alone, and Spark's ContextCleaner reclaims them
  // once the RDD object is unreachable. A strong registry entry was
  // the only thing keeping an unreleased localCheckpoint RDD alive
  // (pinning its MEMORY_AND_DISK blocks forever in a non-releasing
  // library caller); a weak entry lets the GC fallback work again,
  // while harness callers that do call release() still free tracked
  // blocks eagerly. No staleness hazard either: lineage is gone by
  // construction, so nothing can silently recompute from old files.
  // WeakHashMap is not thread-safe — access synchronizes on the set
  // ([[release]] copies under the lock, unpersists outside it).
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

  /** Unpersist (non-blocking) every tracked intermediate. The weak
    * RDD set drains under its lock (synchronized-set iteration is not
    * safe without it), then unpersists outside it. */
  def release(): Unit = {
    val it = tracked.iterator()
    while (it.hasNext) { it.next().unpersist(false); it.remove() }
    val rdds = trackedRdds.synchronized {
      val c = new java.util.ArrayList[org.apache.spark.rdd.RDD[_]](trackedRdds)
      trackedRdds.clear(); c
    }
    rdds.forEach(_.unpersist(false))
  }

  /** Number of currently-tracked intermediates (test hook). */
  def trackedCount: Int = tracked.size() + trackedRdds.size()

  /** Small shared pool for INDEPENDENT query branches (guide §2.6:
    * Spark's scheduler happily runs several jobs at once — actions are
    * only sequential because driver code calls them sequentially).
    * Bounded at 3: enough to back-fill the stage tails of a sibling
    * branch, not enough to thrash the scheduler. Daemon threads so an
    * exiting JVM never hangs on the pool. */
  lazy val branchPool: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(3,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-branch-${n.getAndIncrement()}")
            t.setDaemon(true)
            t
          }
        }))
}

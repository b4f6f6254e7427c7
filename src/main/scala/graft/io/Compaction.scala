package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-safe in-place directory rewrites for the append-only
  * artifacts the ingest loops accrete (the admitted-corpus batch dirs,
  * the band/containment/IVF/PQ index appends): each maintenance
  * rewrite lands in an underscore-prefixed sibling directory —
  * INVISIBLE to Spark readers, which skip `_`/`.`-prefixed names at
  * listing time — and is then swapped in with a marker-file commit
  * protocol.
  *
  * Commit protocol of [[swapIn]] (sources → one compacted dest):
  *  1. write the replacement data into `tmp` (parquet `_SUCCESS` lands
  *     last);
  *  2. write a `_graft_compact_sources` marker into `tmp` listing the
  *     directories the swap will delete — THE commit point;
  *  3. delete every listed source (idempotent), rename `tmp` → `dest`.
  *
  * Crash anywhere before (2): the original layout is untouched and the
  * next attempt reclaims the half-written tmp (roll back). Crash after
  * (2): [[recover]] rolls FORWARD — re-deletes whatever sources remain
  * and re-issues the rename — so readers never see rows duplicated
  * between a source dir and the compacted dest. The only window in
  * which a CONCURRENT reader can see a partial relation is during
  * step (3) itself; compaction is a maintenance operation — run it
  * with the ingest loop quiesced, like any OPTIMIZE.
  *
  * At 100 TB this is the difference between a scan whose task count
  * tracks DATA and one whose task count tracks ingest history: every
  * appended batch adds files (bounded per batch, unbounded across
  * batches), and each file is an open + footer read + scheduler task
  * at query time. Periodic compaction restores file-count ∝ data.
  * Cf. [[Versioned.compact]], which solves the same problem for
  * manifest-committed tables by writing a NEW version; the ingest
  * artifacts here are plain directories that downstream code addresses
  * by fixed path, hence the swap-in-place.
  *
  * The reference has no storage maintenance at all (it overwrites its
  * JSON spill files in place, `/root/reference/mpWorker/worker.go:153-192`);
  * this derives from the north-star lakehouse surface.
  */
object Compaction {

  private val Marker = "_graft_compact_sources"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The underscore-prefixed sibling used as the staging dir for a
    * swap targeting `dest` — deterministic, so recovery after a crash
    * finds the same path. Any `=` in the target's name is mangled
    * away: Spark's listing skips `_`-prefixed names UNLESS they
    * contain `=` (they'd parse as partition dirs), so `_batch=-1.swap`
    * would break partition discovery for concurrent readers of the
    * parent where `_batch~-1.swap` is invisible. */
  def tmpPathOf(dest: String): String = {
    val p = new Path(dest)
    new Path(p.getParent, s"_${p.getName.replace('=', '~')}.swap").toString
  }

  /** Repair an interrupted [[swapIn]] targeting `dest`. Returns true
    * if a committed swap was rolled forward (sources deleted, tmp
    * renamed into place), false if there was nothing to do or an
    * uncommitted tmp was rolled back (deleted). Safe to call when no
    * swap was ever attempted. */
  def recover(spark: SparkSession, dest: String): Boolean = {
    val f = fs(spark, dest)
    val tmp = new Path(tmpPathOf(dest))
    if (!f.exists(tmp)) return false
    val marker = new Path(tmp, Marker)
    if (!f.exists(marker)) { f.delete(tmp, true); return false }
    val in = f.open(marker)
    val listed =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    commit(f, listed, tmp, new Path(dest))
    true
  }

  private def commit(f: org.apache.hadoop.fs.FileSystem,
      sources: Seq[String], tmp: Path, dest: Path): Unit = {
    sources.foreach(s => f.delete(new Path(s), true))
    if (!f.rename(tmp, dest))
      throw new IllegalStateException(s"compaction rename to $dest failed")
  }

  /** Replace `sources` (directories) with a single `dest` directory
    * whose contents are produced by `writeTo` (called with the staging
    * path; it must leave a parquet `_SUCCESS` there, which any normal
    * `df.write.parquet` does). `dest` itself may appear in `sources`
    * (the rewrite-in-place case). Crash-safe per the protocol above. */
  def swapIn(spark: SparkSession, dest: String, sources: Seq[String])(
      writeTo: String => Unit): Unit = {
    recover(spark, dest)
    val f = fs(spark, dest)
    val tmp = new Path(tmpPathOf(dest))
    f.delete(tmp, true) // stale uncommitted attempt
    writeTo(tmp.toString)
    val out = f.create(new Path(tmp, Marker), true)
    try out.write(sources.mkString("\n").getBytes("UTF-8"))
    finally out.close() // marker visible == committed
    commit(f, sources, tmp, new Path(dest))
  }

  private val FoldedManifest = "_graft_folded_ids"

  /** Batch ids recorded as already folded into `root/batch=-1` —
    * empty unless the compacted dir is a COMPLETE committed write
    * (torn compactions must not vouch for anything). The manifest is
    * an underscore-prefixed sidecar INSIDE batch=-1, written in the
    * same staging dir the swap commits, so data and manifest land (or
    * roll back) atomically — a manifest written after the swap would
    * reopen the very window it exists to close.
    *
    * Migration caveat: a `batch=-1` produced by a compaction that
    * predates the manifest carries no sidecar, so its folded set reads
    * as empty and a later session's ensure* re-runs the build for
    * those ids — double-counting the legacy-folded partials once. The
    * exposure is bounded to indexes compacted before the manifest
    * shipped AND read through an ensure whose batchIds include the
    * legacy-folded ids; content-addressed paths mean any config or
    * corpus change re-addresses away from such dirs. Re-compacting a
    * legacy index (any [[foldBatches]] run) writes the manifest and
    * closes the window permanently. */
  def foldedIds(spark: SparkSession, root: String): Set[Long] = {
    val dest = s"$root/batch=-1"
    if (!IndexPaths.complete(spark, dest)) return Set.empty
    val f = fs(spark, dest)
    val p = new Path(dest, FoldedManifest)
    if (!f.exists(p)) return Set.empty
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map(_.toLong).toSet
    finally in.close()
  }

  /** Whether batch `id` of the partial table rooted at `root` is
    * accounted for: its own dir is a complete committed write, OR a
    * complete `batch=-1` records it as folded. The second arm is what
    * keeps ensure-style completeness checks correct AFTER compaction
    * deletes the original dirs — without it a later session re-runs
    * the build and double-counts the already-folded partials. */
  def batchComplete(spark: SparkSession, root: String, id: Long): Boolean =
    IndexPaths.complete(spark, s"$root/batch=$id") ||
      foldedIds(spark, root).contains(id)

  /** The shared fold-into-`batch=-1` compaction of a batch-partitioned
    * partial table (card/memorization/importance/CMS indexes): fold
    * all but the newest `keepLast` batch dirs into `batch=-1` with
    * `agg` — which must be the SAME associative aggregate the read
    * applies, so compaction commutes with the read — via the
    * [[swapIn]] crash-safe protocol, and record the folded ids in the
    * [[foldedIds]] manifest (accumulated across successive
    * compactions; `batch=-1` itself is never listed). */
  def foldBatches(spark: SparkSession, root: String, targetFiles: Int,
      keepLast: Int)(agg: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
    require(targetFiles >= 1 && keepLast >= 0)
    val dest = s"$root/batch=-1"
    recover(spark, dest)
    val rootPath = new Path(root)
    val f = fs(spark, root)
    if (!f.exists(rootPath)) return
    val ids = f.listStatus(rootPath).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") =>
        n.stripPrefix("batch=").toLong }
      .sorted
    val foldIds = ids.dropRight(keepLast)
    if (foldIds.isEmpty || foldIds == Seq(-1L)) return
    val srcs = foldIds.map(id => s"$root/batch=$id")
    // read the PREVIOUS manifest before swapIn deletes dest
    val folded = foldedIds(spark, root) ++ foldIds.filter(_ != -1L)
    swapIn(spark, dest, srcs) { tmp =>
      agg(spark.read.parquet(srcs: _*))
        .coalesce(targetFiles).write.parquet(tmp)
      val out = f.create(new Path(tmp, FoldedManifest), true)
      try out.write(folded.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** File-count compaction of one parquet directory IN PLACE: same
    * rows, same schema, `targetFiles` files. Row-level content is
    * preserved exactly (a plain read → coalesce → write; coalesce
    * merges partitions without a shuffle), so rank/order columns like
    * the band index's stored `__r` survive untouched. No-op if the
    * directory does not exist. */
  def compactDir(spark: SparkSession, path: String,
      targetFiles: Int = 8): Unit = {
    require(targetFiles >= 1)
    recover(spark, path)
    if (!fs(spark, path).exists(new Path(path))) return
    // the staging write re-reads `path`, which still exists until
    // commit-time delete — no read-under-overwrite hazard by design
    swapIn(spark, path, Seq(path)) { tmp =>
      spark.read.parquet(path).coalesce(targetFiles)
        .write.parquet(tmp)
    }
  }
}

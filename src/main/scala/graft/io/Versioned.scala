package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned table: immutable snapshot versions with manifest-commit
  * semantics — the Iceberg/Delta pattern in miniature, built on plain
  * parquet + a JSON manifest per version.
  *
  * Layout:
  * {{{
  *   <root>/data/v<NNNNN>/   (parquet)  immutable snapshot data
  *   <root>/_manifests/v<NNNNN>.json    commit record (THE commit point)
  * }}}
  *
  * A version exists iff its manifest file exists: data is written
  * first, then the manifest is created with an atomic rename — a
  * crashed writer leaves orphan data but never a half-visible version
  * (readers list manifests, not data directories). Single-writer
  * semantics (like a Hive table); concurrent writers would need a
  * lock/CAS on the manifest namespace, which object stores provide
  * via conditional PUT.
  *
  * At 100 TB this scales because a snapshot write is one normal
  * distributed parquet write plus ONE driver-side KB-sized manifest —
  * no small-file metadata explosion, and time-travel reads are
  * directory-pruned to exactly one version's files.
  *
  * The reference has no storage versioning at all (it overwrites its
  * JSON spill files in place, `/root/reference/mpWorker/worker.go:153-192`);
  * this derives from the north-star lakehouse surface, not the
  * reference.
  */
object Versioned {

  private def hadoopFs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vname(v: Long) = f"v$v%05d"

  private def manifestDir(root: String) = s"$root/_manifests"
  private def dataDir(root: String, v: Long) = s"$root/data/${vname(v)}"

  /** All committed versions, ascending (empty if the table doesn't
    * exist yet). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(manifestDir(root))
    val fs = hadoopFs(spark, root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Manifest JSON of `v` (committed metadata), as a Map. */
  def manifest(spark: SparkSession, root: String, v: Long): Map[String, String] = {
    val p = new Path(s"${manifestDir(root)}/${vname(v)}.json")
    val fs = hadoopFs(spark, root)
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    // flat string->string JSON object (written by commit below)
    """"([^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  /** Write `df` as the next version; returns the committed version id.
    * `meta` is recorded in the manifest (e.g. the streaming batch id
    * for idempotent restarts). */
  def write(df: DataFrame, root: String, meta: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    val v = latestVersion(spark, root).map(_ + 1).getOrElse(0L)
    val dest = dataDir(root, v)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dest)
    commit(spark, root, v, meta + ("path" -> dest))
    v
  }

  /** Small-file compaction: rewrite a snapshot's data as a NEW version
    * with `targetFiles` files — the answer to streaming/CDC appends
    * accreting thousands of KB-sized parquet files (each file is a
    * task + an open + a footer read at scan time; at 100 TB the
    * metadata and task-scheduling overhead of tiny files dominates the
    * scan). The rewrite is one distributed read + coalesced write +
    * manifest commit: readers of older versions are untouched, a crash
    * leaves orphan data but no visible half-version, and vacuum later
    * reclaims the fragmented snapshot. Returns the new version id. */
  def compact(spark: SparkSession, root: String, targetFiles: Int,
      version: Option[Long] = None): Long = {
    require(targetFiles >= 1)
    val src = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $root"))
    write(read(spark, root, Some(src)).coalesce(targetFiles), root,
      Map("compacted_from" -> src.toString))
  }

  /** Change feed BETWEEN two snapshots: per key, whether it was
    * inserted, deleted, or updated (any non-key column differs) from
    * `vOld` to `vNew` — the EMIT side of CDC ([[graft.streaming.Cdc]]
    * is the apply side). Consumers resync incrementally from any
    * version they last saw instead of re-reading the whole table.
    *
    * One full-outer join of the two snapshots, hash-partitioned on the
    * key; the value columns are compared as single structs (null-safe
    * `<=>`), so any schema's row compares in one expression. Returns
    * (key, op ∈ insert|delete|update) — unchanged keys are absent. */
  def diff(spark: SparkSession, root: String, vOld: Long, vNew: Long,
      key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def packed(v: Long, tag: String) = {
      val df = read(spark, root, Some(v))
      df.select(col(key),
        struct(df.columns.filter(_ != key).map(col).toIndexedSeq: _*)
          .as(s"__$tag"))
    }
    packed(vOld, "o").join(packed(vNew, "n"), Seq(key), "full_outer")
      .select(col(key),
        when(col("__o").isNull, lit("insert"))
          .when(col("__n").isNull, lit("delete"))
          .when(!(col("__o") <=> col("__n")), lit("update")).as("op"))
      .where(col("op").isNotNull)
  }

  /** Commit point: manifest written to a temp name, then atomically
    * renamed into place. */
  private def commit(spark: SparkSession, root: String, v: Long,
      meta: Map[String, String]): Unit = {
    val fs = hadoopFs(spark, root)
    val dir = new Path(manifestDir(root))
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".${vname(v)}.json.tmp")
    val fin = new Path(dir, s"${vname(v)}.json")
    val entries = (meta + ("version" -> v.toString))
      .map { case (k, w) => s""""$k": "$w"""" }.mkString("{", ", ", "}")
    val out = fs.create(tmp, true)
    try out.write(entries.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, fin))
      throw new IllegalStateException(s"commit of version $v failed (rename)")
  }

  /** Time-travel read: snapshot `version`, or the latest when None.
    * Exactly one version's files are read — older/newer snapshots are
    * never touched. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $root"))
    spark.read.parquet(manifest(spark, root, v)("path"))
  }

  /** Retention: drop all but the newest `keepLast` versions — manifest
    * first (the version disappears atomically for readers), data
    * second (space reclaim; a crash in between leaves only unreferenced
    * orphan files, never a manifest pointing at deleted data). Returns
    * the vacuumed version ids. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val fs = hadoopFs(spark, root)
    val old = versions(spark, root).dropRight(keepLast)
    old.foreach { v =>
      fs.delete(new Path(s"${manifestDir(root)}/${vname(v)}.json"), false)
      fs.delete(new Path(dataDir(root, v)), true)
    }
    old
  }
}

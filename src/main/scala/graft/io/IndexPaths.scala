package graft.io

/** Canonical on-disk locations for derived indexes (the MinHash band
  * index, the IVF centroid index): content-addressed so distinct
  * sources can never alias and a REGENERATED source invalidates
  * naturally.
  *
  * The round-4 scheme keyed the path on `dir.hashCode` — a 32-bit
  * value shared JVM-wide, so (a) two different source dirs could
  * collide onto one index, and (b) regenerating the data UNDER a dir
  * inside a long-lived session silently reused the stale index. The
  * key here is an md5 over the FULL source path, the builder's
  * parameters, and a file fingerprint (relative name, byte size,
  * mtime of every data file), so any of those changing yields a fresh
  * path — the build-once memos in `Dedup.ensureBandIndex` /
  * `Similarity.ivfTopKIndexed` then rebuild because the PATH is new,
  * no explicit invalidation needed for the common cases. Explicit
  * hooks exist for the rest (e.g. deleting an index dir out from
  * under a running session): [[graft.operators.Dedup.invalidateBandIndex]]
  * and [[graft.operators.Similarity.invalidateIvfIndex]].
  *
  * Root directory: `graft.index.root` system property, else the JVM
  * temp dir.
  */
object IndexPaths {

  def root: String =
    sys.props.getOrElse("graft.index.root", sys.props("java.io.tmpdir"))

  /** Stable fingerprint of a data file or directory-of-files: every
    * data file's (relative name, length, mtime). Missing source → "-",
    * so the path is still deterministic (the builder will fail loudly
    * on read instead). */
  def fingerprint(source: java.io.File): String = {
    if (!source.exists()) "-"
    else {
      val files =
        if (source.isFile) Seq(source)
        else Option(source.listFiles()).getOrElse(Array.empty)
          .filter(_.isFile).sortBy(_.getName).toSeq
      files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString(",")
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Whether the table at `path` is a COMPLETE committed write: the
    * `_SUCCESS` marker Spark's file committer drops after the last
    * task. A dir that exists without it is a torn write (build JVM
    * killed mid-job) — readers must treat it as absent and rebuild,
    * not silently read partial data. Checked through the Hadoop
    * FileSystem so non-local roots behave the same. */
  def complete(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Index path for `kind` (e.g. "bandidx", "ivf") derived from the
    * source file/dir at `sourcePath` and the builder parameter string.
    */
  def indexPath(kind: String, sourcePath: String, params: String): String = {
    val key = md5Hex(Seq(
      new java.io.File(sourcePath).getAbsolutePath,
      params,
      fingerprint(new java.io.File(sourcePath))).mkString("|"))
    s"$root/graft_${kind}_$key"
  }
}

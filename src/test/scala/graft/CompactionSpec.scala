package graft

import org.apache.spark.sql.functions._

import graft.io.Compaction

/** The marker-commit swap protocol behind ingest-artifact compaction:
  * an uncommitted staging dir must roll BACK (original layout
  * untouched), a committed one must roll FORWARD (sources deleted,
  * staging renamed in), and the staging dir must be invisible to
  * readers of the parent while it exists. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def writeRows(path: String, rows: (Long, String)*): Unit =
    rows.toDF("id", "v").coalesce(1).write.parquet(path)

  private def readIds(path: String): Set[Long] =
    spark.read.parquet(path).select("id").collect().map(_.getLong(0)).toSet

  test("uncommitted staging dir rolls back; sources untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_swap_rb").toString
    val dest = s"$root/part=0"
    writeRows(dest, 1L -> "a")
    // simulate a crash mid-write: staging exists, no marker, no _SUCCESS
    val tmp = new java.io.File(Compaction.tmpPathOf(dest))
    assert(tmp.mkdirs())
    java.nio.file.Files.write(tmp.toPath.resolve("partial.parquet"),
      "torn".getBytes)
    assert(!Compaction.recover(spark, dest), "uncommitted tmp is not a commit")
    assert(!tmp.exists(), "rolled-back staging must be reclaimed")
    assert(readIds(dest) == Set(1L), "original data untouched")
  }

  test("committed staging dir rolls forward: sources deleted, rename re-issued") {
    val root = java.nio.file.Files.createTempDirectory("graft_swap_rf").toString
    val s1 = s"$root/part=0"; val s2 = s"$root/part=1"
    writeRows(s1, 1L -> "a"); writeRows(s2, 2L -> "b")
    val dest = s"$root/part=-1"
    // simulate a crash AFTER the marker write but before any deletes:
    // staging holds the full replacement + the source list
    val tmp = Compaction.tmpPathOf(dest)
    Seq(1L -> "a", 2L -> "b").toDF("id", "v").coalesce(1).write.parquet(tmp)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "_graft_compact_sources"),
      s"$s1\n$s2".getBytes("UTF-8"))
    // a reader of the parent must NOT see staged rows double-counted
    // (underscore-prefixed dirs are skipped by Spark's listing)
    assert(spark.read.parquet(root).count() == 2)
    assert(Compaction.recover(spark, dest), "marker present == committed")
    assert(!new java.io.File(s1).exists() && !new java.io.File(s2).exists())
    assert(readIds(dest) == Set(1L, 2L))
    assert(spark.read.parquet(root).count() == 2, "no duplication after swap")
    // idempotent: a second recover is a no-op
    assert(!Compaction.recover(spark, dest))
  }

  test("compactDir: same rows, bounded files, safe to re-run") {
    val root = java.nio.file.Files.createTempDirectory("graft_swap_cd").toString
    val dir = s"$root/idx"
    (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(10).write.parquet(dir)
    val before = readIds(dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) == 10)
    Compaction.compactDir(spark, dir, targetFiles = 2)
    assert(readIds(dir) == before)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) <= 2)
    Compaction.compactDir(spark, dir, targetFiles = 2) // idempotent re-run
    assert(readIds(dir) == before)
  }
}

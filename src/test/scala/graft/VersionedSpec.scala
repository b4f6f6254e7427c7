package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.Versioned
import graft.streaming.Cdc

/** Versioned (snapshot/time-travel) tables and the streaming CDC apply
  * loop built on them. */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("versioned write/read: snapshots immutable, time travel exact, latest wins") {
    val root = tmp("vt")
    val v0 = Versioned.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root)
    val v1 = Versioned.write(Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("k", "s"), root)
    assert(v0 === 0L && v1 === 1L)
    assert(Versioned.versions(spark, root) === Seq(0L, 1L))
    val at0 = Versioned.read(spark, root, Some(0L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at0 === Map(1L -> "a", 2L -> "b"), "old snapshot unchanged")
    val latest = Versioned.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    assert(Versioned.manifest(spark, root, 1L)("version") === "1")
  }

  test("read of an empty table fails loudly") {
    val root = tmp("vt-empty")
    intercept[IllegalArgumentException] { Versioned.read(spark, root) }
  }

  test("applyBatch: merges latest-wins per key, records batch id, replay is a no-op") {
    val root = tmp("cdc")
    Versioned.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal"), root)
    // batch with two changes for k=2: seq 5 must win; k=9 is an insert
    val batch = Seq((2L, 4L, 77.0), (2L, 5L, 99.0), (9L, 1L, 9.0))
      .toDF("k", "seq", "bal")
    val v = Cdc.applyBatch(batch, batchId = 0L, root, "k", Seq("bal"), "seq")
    assert(v === Some(1L))
    val got = Versioned.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 10.0, 2L -> 99.0, 9L -> 9.0))
    // replay of the same batch id (crash between manifest write and
    // checkpoint commit) must not re-apply
    assert(Cdc.applyBatch(batch, batchId = 0L, root, "k", Seq("bal"), "seq").isEmpty)
    assert(Versioned.versions(spark, root) === Seq(0L, 1L))
    // a later batch applies on top
    val b1 = Seq((1L, 6L, 11.0)).toDF("k", "seq", "bal")
    assert(Cdc.applyBatch(b1, batchId = 1L, root, "k", Seq("bal"), "seq") === Some(2L))
    assert(Versioned.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(1L -> 11.0, 2L -> 99.0, 9L -> 9.0))
  }

  test("vacuum: old versions disappear atomically, newest survive, write continues") {
    val root = tmp("vt-vac")
    (0 to 3).foreach(i => Versioned.write(Seq((i.toLong, i.toString)).toDF("k", "s"), root))
    val dropped = Versioned.vacuum(spark, root, keepLast = 2)
    assert(dropped === Seq(0L, 1L))
    assert(Versioned.versions(spark, root) === Seq(2L, 3L))
    assert(Versioned.read(spark, root).collect().head.getLong(0) === 3L)
    intercept[Exception] { Versioned.read(spark, root, Some(0L)).collect() }
    // next write continues the version sequence past the vacuumed range
    assert(Versioned.write(Seq((9L, "z")).toDF("k", "s"), root) === 4L)
  }

  test("compact: same rows, fewer files, old versions untouched") {
    val root = tmp("compact")
    val frag = spark.range(0, 1000).toDF("k").repartition(8)
    Versioned.write(frag, root)
    def nFiles(v: Long): Int = new java.io.File(s"$root/data/" + f"v$v%05d")
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(nFiles(0L) === 8)
    val v = Versioned.compact(spark, root, targetFiles = 1)
    assert(v === 1L)
    assert(nFiles(1L) === 1)
    // identical contents, and the fragmented snapshot still time-travels
    assert(Versioned.read(spark, root, Some(1L)).as[Long].collect().sorted
      === (0L until 1000L).toArray)
    assert(Versioned.read(spark, root, Some(0L)).count() === 1000L)
    assert(Versioned.manifest(spark, root, 1L)("compacted_from") === "0")
    // vacuum now reclaims the fragmented version
    assert(Versioned.vacuum(spark, root, keepLast = 1) === Seq(0L))
  }

  test("diff: insert/delete/update change feed between any two versions") {
    val root = tmp("diff")
    Versioned.write(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "x"), root)
    Versioned.write(Seq((2L, "b", 2.0), (3L, "c", 30.0), (4L, "d", 4.0))
      .toDF("k", "s", "x"), root)
    val got = Versioned.diff(spark, root, 0L, 1L, "k")
      .as[(Long, String)].collect().toSet
    // 1 gone, 2 unchanged (absent), 3 changed, 4 new
    assert(got === Set((1L, "delete"), (3L, "update"), (4L, "insert")))
    // reversed direction flips the ops
    val rev = Versioned.diff(spark, root, 1L, 0L, "k")
      .as[(Long, String)].collect().toSet
    assert(rev === Set((1L, "insert"), (3L, "update"), (4L, "delete")))
    // identical versions diff to nothing
    assert(Versioned.diff(spark, root, 1L, 1L, "k").count() === 0L)
  }

  test("applyStream: end-to-end streaming upserts land, one version per batch") {
    val root = tmp("cdc-stream")
    val ckpt = tmp("cdc-ckpt")
    Versioned.write(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "bal"), root)
    val ms = MemoryStream[(Long, Long, Double)](spark)
    val updates = ms.toDF().toDF("k", "seq", "bal")
    val sq = Cdc.applyStream(updates, root, "k", Seq("bal"), "seq", ckpt)
    ms.addData((1L, 1L, 5.0)); sq.processAllAvailable()
    ms.addData((3L, 2L, 7.0), (3L, 3L, 8.0)); sq.processAllAvailable()
    sq.stop()
    val got = Versioned.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 5.0, 2L -> 2.0, 3L -> 8.0))
    assert(Versioned.versions(spark, root).size === 3) // seed + 2 batches
    // time travel to the seed still shows the original balances
    assert(Versioned.read(spark, root, Some(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(1L -> 1.0, 2L -> 2.0))
  }
}

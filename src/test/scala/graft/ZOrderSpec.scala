package graft

import org.apache.spark.sql.functions._

import graft.io.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }

  test("interleave matches the reference Morton encoding") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"))).as[Long].collect()
    assert(got.toSeq === cases.map((mortonRef _).tupled))
  }

  test("z-order curve is monotone in locality: quadrants sort together") {
    // all points of the low-low quadrant come before any high-high point
    val lowLow = mortonRef(100L, 100L)
    val highHigh = mortonRef(40000L, 40000L)
    assert(lowLow < highHigh)
  }

  test("z-ordered files prune on BOTH dimensions; linear sort only on one") {
    val n = 20000
    // two independent uniform dims
    val df = spark.range(0, n).select(
      (xxhash64(col("id")).bitwiseAND(lit(65535L))).as("a"),
      (xxhash64(col("id"), lit(1)).bitwiseAND(lit(65535L))).as("b"))
      .persist()
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString + "/t"
    ZOrder.writeZOrdered(df, zdir, "a", "b", numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(ldir)
    // same rows either way
    assert(spark.read.parquet(zdir).count() === n.toLong)
    // a narrow range on each dimension (1/16 of the domain)
    val (zHitA, zAll) = ZOrder.pruneRatio(spark, zdir, "a", 0L, 4095L)
    val (zHitB, _) = ZOrder.pruneRatio(spark, zdir, "b", 0L, 4095L)
    val (lHitA, lAll) = ZOrder.pruneRatio(spark, ldir, "a", 0L, 4095L)
    val (lHitB, _) = ZOrder.pruneRatio(spark, ldir, "b", 0L, 4095L)
    assert(zAll === 16 && lAll === 16)
    // linear layout: perfect on the sort column, useless on the other
    assert(lHitA <= 2, s"linear should prune on a: $lHitA")
    assert(lHitB === 16, s"linear cannot prune on b: $lHitB")
    // z-order: strong pruning on BOTH (a 1/16 slab touches a bounded
    // band of the curve, not every stripe)
    assert(zHitA <= 8, s"z-order must prune on a: $zHitA/16")
    assert(zHitB <= 8, s"z-order must prune on b: $zHitB/16")
    df.unpersist()
  }
}

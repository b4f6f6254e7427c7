package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write clustering for multi-column data
  * skipping — the lakehouse `OPTIMIZE ZORDER BY` pattern on plain
  * parquet.
  *
  * A single-column sort gives perfect file-level min/max pruning on
  * that column and NONE on any other. Interleaving the bits of two
  * normalized columns orders rows along a space-filling curve, so each
  * output file covers a small RECTANGLE of the (a, b) domain: range
  * predicates on EITHER column prune most files (footer min/max stats,
  * no index needed). At 100 TB this is the difference between scanning
  * one file stripe and scanning everything when the query filters on
  * the second dimension.
  *
  * The z-value is a pure Catalyst expression tree (shifts/masks —
  * whole-stage codegen'd); the write is `repartitionByRange` on it
  * (range exchange via sampled bounds — the scalable total-order
  * partitioner) + a within-partition sort, so file k holds the k-th
  * contiguous stripe of the curve.
  */
object ZOrder {

  private val BITS = 16

  /** Bit-interleave two BITS-bit non-negative longs: x's bit i lands at
    * 2i+1, y's at 2i (x is the high lane). */
  def interleave(x: Column, y: Column): Column =
    (0 until BITS).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)) +
        (shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ + _)

  /** Min/max-normalize a numeric column onto [0, 2^BITS). The bounds
    * come from one tiny aggregate; a constant column maps to 0. */
  private def scaled(c: Column, lo: Long, hi: Long): Column =
    if (hi == lo) lit(0L)
    else (c.cast("long") - lit(lo)) * lit((1L << BITS) - 1) / lit(hi - lo)

  /** The z-value of `df`'s columns `a` and `b` (long-valued), with
    * normalization bounds computed from the data. Returns (df + __z). */
  def withZValue(df: DataFrame, a: String, b: String): DataFrame = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head()
    df.withColumn("__z", interleave(
      scaled(col(a), r.getLong(0), r.getLong(1)),
      scaled(col(b), r.getLong(2), r.getLong(3))))
  }

  /** Write `df` as `numFiles` parquet files z-ordered on (a, b). */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1)
    withZValue(df, a, b)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** File-level pruning ratio a min/max-stats reader would achieve for
    * `lo <= c <= hi`: (files whose [min, max] intersects the range) /
    * (all files). Reads only footers-worth of data per file — this is
    * the measurement harness for the skipping claim, not a query path. */
  def pruneRatio(spark: org.apache.spark.sql.SparkSession, path: String,
      c: String, lo: Long, hi: Long): (Int, Int) = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    val hit = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
      !(r.getLong(1) < lo || r.getLong(0) > hi)
    }
    (hit, files.length)
  }
}

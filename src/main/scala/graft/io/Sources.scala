package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2 Part B "Scans/sources" / "Sinks").
  *
  * The reference reads whole files as bytes (`mpMaster/master.go:77-89`)
  * and writes per-bucket JSON array files (`mpWorker/worker.go:153-192`).
  * Here: Spark's format readers with the engine's conventions pinned —
  * explicit schema (no runtime inference surprises at 100 TB: an
  * inference pass is a full extra scan), and partitioned columnar sinks.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema — `inferSchema` double-scans the input. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines with an explicit schema (one extra scan avoided; also
    * pins types the inferencer would widen). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Line-oriented text — the reference's input model with correct
    * (line-aware) splitting. */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Whole-file binary blobs (path, modificationTime, length, content). */
  def binary(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** ORC — the other columnar interchange format (predicate pushdown and
    * column pruning work the same as parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Partitioned parquet sink — the engine's primary output format.
    * `partitionBy` reproduces the reference's per-bucket file layout
    * (`<workerIP>_<bucket>.json`) as directory partitions that later
    * scans can prune. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** JSON-lines sink (the reference's intermediate encoding, A7). */
  def writeJsonLines(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Bucketed managed table: pre-hash-partitioned AND pre-sorted on the
    * join/agg key. Two tables bucketed the same way join with ZERO
    * exchanges (verified in BucketingSpec) — at 100 TB this is how a
    * repeatedly-joined fact table amortizes its shuffle once at write
    * time instead of paying it per query. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    import org.apache.spark.sql.graft.shim
    // a managed table dropped by metastore loss (new session, same
    // warehouse dir) leaves an orphan location that Overwrite refuses —
    // clear both the catalog entry and any stale directory. The stale
    // path is resolved from the CATALOG (works for qualified names) and
    // cleared only when it is safe: the prior table was MANAGED, or no
    // table exists but the default managed location is occupied (the
    // orphan case). An EXTERNAL table's data is never touched.
    val stale: Option[String] = shim.tableInfo(spark, table) match {
      case Some((managed, loc)) => if (managed) Some(loc) else None
      case None                 => Some(shim.defaultTablePath(spark, table))
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    stale.foreach { l =>
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(l))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
  }
}

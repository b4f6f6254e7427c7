package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query inventory + its DuckDB oracle SQL.
  *
  * Cross-engine exactness rules (so result hashes match the oracle
  * bit-for-bit):
  *  - Raw double columns pass through untouched (same bits both sides).
  *  - Aggregated money/rate doubles are cast to generous-scale decimals
  *    first (DECIMAL(14,6) / DECIMAL(8,6)): decimal arithmetic is exact
  *    in both engines within 38 digits, and `round(sum, 4)` cast to
  *    double converts a small exact rational identically everywhere.
  *  - Integer-valued counts are BIGINT on both sides.
  *  - Divisions produce doubles only from exact integer/decimal operands
  *    (single correctly-rounded IEEE op — deterministic).
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  /** Tables whose pipelines do heavy per-row compute (tokenize/explode,
    * 64-hash MinHash, 64-dim vector math) and so need parallel scans. */
  private val computeHeavy = Set("documents", "embeddings")

  /** Parquet scan parallelism is row-group-bound, and the driver's
    * testdata ships ONE row group per file — so every pre-shuffle
    * pipeline runs on one core regardless of maxPartitionBytes
    * (measured: a 21 s single-task MinHash cache build at sf0.1). A
    * production lake has row-group-sized splits and wouldn't need this;
    * here we round-robin the compute-heavy tables out to the session's
    * parallelism. Cheap scan→agg tables stay un-repartitioned: the
    * extra shuffle costs more than single-core partial aggregation
    * saves. Filters/pruning still push below the repartition. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (computeHeavy(name)) df.repartition(s.sparkContext.defaultParallelism)
    else df
  }

  /** events.ts is nanosecond-precision parquet, which Spark's reader
    * rejects by default; read it as raw long nanos and truncate to a
    * TimestampType (µs) — matching DuckDB's CAST(ts AS TIMESTAMP). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, dir, "events")
    df.schema("ts").dataType.typeName match {
      case "long" => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case "timestamp_ntz" => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Literal comparable to a (possibly NTZ) timestamp column. */
  def tsLit(df: DataFrame, c: String, v: String): Column =
    lit(v).cast(df.schema(c).dataType)

  val MONEY = "decimal(14,6)"
  val RATE = "decimal(8,6)"
  def money(c: Column): Column = c.cast(MONEY)
  def oneMinus(c: Column): Column = lit(1).cast("decimal(9,6)") - c.cast(RATE)
  def onePlus(c: Column): Column = lit(1).cast("decimal(9,6)") + c.cast(RATE)
  /** SUM over exact decimals → round(4) → double: bit-stable. */
  def sumMoney(c: Column): Column = round(sum(c), 4).cast("double")

  // SQL mirrors of the decimal fragments (DuckDB dialect, ANSI).
  val SQL_MONEY_EXT = "CAST(l_extendedprice AS DECIMAL(14,6))"
  val SQL_DISC_FACTOR = "(CAST(1 AS DECIMAL(9,6)) - CAST(l_discount AS DECIMAL(8,6)))"
  val SQL_TAX_FACTOR = "(CAST(1 AS DECIMAL(9,6)) + CAST(l_tax AS DECIMAL(8,6)))"
  val SQL_REVENUE = s"$SQL_MONEY_EXT * $SQL_DISC_FACTOR"
  def sqlSumMoney(inner: String): String = s"CAST(ROUND(SUM($inner), 4) AS DOUBLE)"
  def sqlMoney(c: String): String = s"CAST($c AS DECIMAL(14,6))"
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * the engine can expose custom Catalyst expressions (e.g.
  * [[graft.functions.expr.DotProductQ]]) through the public Column API.
  * Same approach used by third-party Spark libraries (frameless,
  * spark-daria) — lives in an `org.apache.spark.sql` subpackage solely
  * to satisfy the access modifier; no Spark internals are modified.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a LogicalPlan as a DataFrame (classic-mode sessions). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Resolved logical plan of a DataFrame. */
  def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The materialized RDDs at the LogicalRDD leaves of `df`'s analyzed
    * plan — what `Dataset.localCheckpoint()` returns wraps exactly one
    * of these. Exposed so a cache registry can unpersist checkpoint
    * blocks explicitly instead of waiting for the ContextCleaner to GC
    * them. */
  def leafRdds(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }

  /** Rebuild a checkpoint-leaf DataFrame WITHOUT the origin statistics
    * Spark ≥3.4 captures into `LogicalRDD` (SPARK-39748): an ITERATIVE
    * algorithm that checkpoints every round inherits round k's
    * size-in-bytes ESTIMATE as round k+1's leaf size, and since join
    * estimates are products of their children, the estimate compounds
    * geometrically — by round ~5 of a contraction loop the BigInt
    * sizeInBytes holds millions of digits and Catalyst's stats visitor
    * spends MINUTES in BigInteger.multiply (observed as a "hang" in
    * stats estimation, 100% driver CPU in Toom-Cook multiplication).
    * Stripping the origin stats resets the leaf to the default unknown
    * size; AQE still sees the REAL materialized sizes at runtime, so
    * broadcast decisions are unaffected. */
  def stripOriginStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    // NOT a `transform`: LogicalRDD's case-class equality covers only
    // its FIRST parameter list (originStats sits in the second), so a
    // rebuilt node compares equal and transformDown keeps the original.
    // A checkpointed Dataset's analyzed plan IS the leaf — match it
    // directly and rebuild.
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        ofRows(spark, new org.apache.spark.sql.execution.LogicalRDD(
          l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          None, None))
      case _ => df
    }
  }

  /** Create-or-lookup the driver's StateStoreCoordinator RPC endpoint.
    * Streaming queries register it on start; BATCH execution of
    * stateful operators (transformWithState) looks it up but never
    * creates it — so a batch-only session must init it explicitly. */
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get, spark.sessionState.conf)

  /** Catalog metadata of `table` (any qualified form the parser accepts):
    * Some((isManaged, locationUri)) if it exists, None otherwise. */
  def tableInfo(spark: org.apache.spark.sql.SparkSession,
      table: String): Option[(Boolean, String)] = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (cat.tableExists(ident)) {
      val m = cat.getTableMetadata(ident)
      Some((m.tableType ==
        org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED,
        m.location.toString))
    } else None
  }

  /** Register a Catalyst expression builder as a SQL-callable function
    * on a LIVE session (the extension-free path: `spark.sql.extensions`
    * only applies at session build time, but a library user often has a
    * session already). Overwrites any previous registration of `name`. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info,
        (exprs: Seq[Expression]) => builder(exprs))

  /** The location the catalog WOULD assign to a managed table of this
    * name — where a metastore-loss orphan directory would live. */
  def defaultTablePath(spark: org.apache.spark.sql.SparkSession,
      table: String): String = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    cat.defaultTablePath(ident).toString
  }
}

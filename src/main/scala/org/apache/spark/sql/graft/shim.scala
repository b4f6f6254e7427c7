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

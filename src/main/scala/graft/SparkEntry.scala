package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{GraphQueries, MapReduceQueries, MediaQueries, Q, RelationalQueries, StreamQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine re-expresses the capability contract of
  * Noahnut/MapReduceGo (a MapReduce framework whose Reduce phase was
  * never implemented — SURVEY §1.4) as idiomatic Spark, plus the
  * relational + LLM-data-pipeline operator inventory of SURVEY §2.
  * Every query here has, where SQL-expressible, a DuckDB oracle in
  * [[oracleSql]] whose result hash-matches bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full source→map→shuffle→reduce→result pipeline the reference
    * never completed: scan, join, filter, hash-agg. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MapReduceQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++
      StreamQueries.queries ++ MediaQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose outputs depend on
    * engine-internal hashes (SimHash signatures, LSH bucket membership)
    * → driver records a weaker rows-only check; those operators are
    * instead asserted against brute-force baselines in the test suite. */
  def oracleSql: Map[String, String] =
    MapReduceQueries.oracles ++ RelationalQueries.oracles ++
      TextQueries.oracles ++ VectorQueries.oracles ++
      StreamQueries.oracles ++ MediaQueries.oracles ++ GraphQueries.oracles
}

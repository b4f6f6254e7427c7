package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch operators (Apache DataSketches via Spark 4's
  * `hll_sketch_agg` family). The defining property at 100 TB: sketches
  * COMBINE — per-partition / per-day / per-shard partials union into
  * exact rollups of the approximate state without touching raw data
  * again, the same algebra map-side partial aggregation exploits. A
  * daily sketch table is a few KB per bucket regardless of row count,
  * and any ad-hoc rollup (weekly, monthly, all-time) is a union over
  * sketch bytes, never a rescan.
  *
  * Estimator nuance: DataSketches HLL carries an order-sensitive HIP
  * estimator on never-merged sketches but falls back to the composite
  * (register-only) estimator after any union. Every distributed path
  * here merges, so estimates are a pure function of the input SET —
  * partition- and order-invariant (pinned in SketchTextSpec) — but a
  * single-node never-merged sketch of the same data may differ by a
  * fraction of a percent. Both sit inside the lgK=12 error bounds.
  */
object Sketches {

  /** Per-bucket HLL sketches of `key` — the materialized sketch table.
    * One shuffle on the bucket; map-side partial sketches combine. */
  def hllBuckets(df: DataFrame, bucket: Column, key: Column): DataFrame =
    df.select(bucket.as("bucket"), key.as("k"))
      .groupBy(col("bucket"))
      .agg(expr("hll_sketch_agg(k)").as("sk"))

  /** Roll sketch buckets up to a coarser grain: union the sketch bytes,
    * estimate at the end. Touches only the (tiny) sketch table. */
  def hllRollup(sketches: DataFrame, rollup: Column): DataFrame =
    sketches.groupBy(rollup.as("grain"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"),
        count(lit(1)).as("n_buckets"))
}

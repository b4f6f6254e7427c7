package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping: dense-grid gap filling and last-observation-
  * carried-forward — the resample/align primitives a feature-engineering
  * pipeline needs before windowed training aggregates.
  *
  * The reference has no time types at all (all values are strings,
  * `/root/reference/mpWorker/worker.go:43-46`); these derive from its
  * generalized contract the same way the window operators do: group by
  * a (series, bucket) key, then fill against a generated dense axis.
  *
  * Scale shape: the dense axis (buckets × series) is tiny relative to
  * the events that populate it — days×types, not rows — so it is
  * generated driver-free with `sequence()` and BROADCAST to the
  * per-bucket aggregates; the only big-data shuffle is the groupBy on
  * (series, bucket), which partial-aggregates map-side. No collect, no
  * driver loop, no skew (bucket keys are uniform by construction).
  */
object Timeseries {

  /** Dense hourly activity grid: one row per (event_type, hour) across
    * the full observed span, zero-filled where no events landed.
    *
    * `ev` needs `event_type` and a timestamp `ts`. */
  def gapFillHourlyCounts(ev: DataFrame): DataFrame = {
    val e = ev.select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val counts = e.groupBy("event_type", "h").agg(count(lit(1)).as("n_events"))
    // span and series-list are one-row/few-row aggregates: generate the
    // dense axis from them and broadcast — never materialized at scale
    val hours = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
    val types = e.select("event_type").distinct()
    types.crossJoin(broadcast(hours))
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Last observation carried forward on a dense daily grid, per user:
    * each user's daily MAX(value) observation, forward-filled across
    * days with no events (`last(_, ignoreNulls)` over an unbounded-
    * preceding frame — the standard LOCF window shape).
    *
    * Output: (user_id, d, obs, filled) where `obs` is null on gap days
    * and `filled` carries the last prior observation (null until the
    * user's first). MAX is the daily summary deliberately: it is
    * arithmetic-free and so bit-stable across engines. */
  def forwardFillDaily(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
    val daily = e.groupBy("user_id", "d").agg(max(col("value")).as("obs"))
    val days = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val users = e.select("user_id").distinct()
    val grid = users.crossJoin(broadcast(days))
      .join(daily, Seq("user_id", "d"), "left")
    // the fill window partitions by user — state is one value per
    // series, and Spark's WindowExec streams it; no per-user collect
    val w = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.select(col("user_id"), col("d"), col("obs"),
      last(col("obs"), ignoreNulls = true).over(w).as("filled"))
  }

  /** Numeric distribution drift — the metric twin of
    * `TextAnalysis.termDrift`: per-group interpolated quantiles of a
    * (pre-quantized, exact-integer) value column compared between two
    * slices (old snapshot vs new ingest, control vs treatment). Both
    * frames need (`groupCol`, `vq`: long). Emits one row per
    * (group, quantile): each side's value and the absolute difference —
    * the per-decile shift report a feature-distribution monitor
    * publishes. Interpolation runs on exact integer ranks (the same
    * `percentile` ↔ `percentile_cont` parity the oracle suite already
    * pins for q_percentile).
    *
    * Scale shape: `percentile` is a partial-aggregating sketchless
    * aggregate (sorted per group at the reducer) over FEW groups — the
    * shuffle carries (group, vq) pairs with map-side batching; the
    * quantile fan-out and the full-outer join are group×quantile-sized
    * (tiny). Groups here are categories, not keys — for high-cardinality
    * groups use approx_percentile instead. */
  def quantileDrift(a: DataFrame, b: DataFrame, groupCol: String,
      qs: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val qArr = qs.mkString("array(", ", ", ")")
    def side(d: DataFrame, vn: String) =
      d.groupBy(col(groupCol))
        .agg(expr(s"percentile(vq, $qArr)").as("__ps"))
        .select(col(groupCol), posexplode(col("__ps")).as(Seq("__qi", vn)))
    side(a, "v_a").join(side(b, "v_b"), Seq(groupCol, "__qi"), "full_outer")
      .select(col(groupCol),
        element_at(typedLit(qs), col("__qi") + 1).as("quantile"),
        col("v_a"), col("v_b"),
        abs(col("v_a") - col("v_b")).as("v_diff"))
  }
}

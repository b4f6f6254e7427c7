package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.Streams
import Q._

/** Streaming-operator coverage. The transforms are Structured Streaming
  * shapes (watermark + tumbling window, merging session windows,
  * flatMapGroupsWithState) but every one is batch-evaluable over the
  * full `events` table — which is exactly the end-state a stream
  * converges to once the watermark passes — so each has a bit-exact
  * DuckDB oracle. True incremental execution is asserted in
  * StreamingSpec via MemoryStream.
  */
object StreamQueries {

  val queries: Map[String, QFn] = Map(
    // Tumbling 1-hour windows × event_type: the canonical watermarked agg.
    "q_stream_window_counts" -> { (s, dir) =>
      Streams.windowedTypeCounts(events(s, dir))
    },

    // Merging session windows (30 min gap) per user via session_window.
    "q_stream_session_window" -> { (s, dir) =>
      Streams.sessionWindowStats(events(s, dir))
    },

    // Stream-stream interval join (watermark-bounded state in streaming;
    // identical plan in batch).
    "q_stream_join" -> { (s, dir) =>
      Streams.clickPurchaseJoin(events(s, dir))
    },

    // LEFT OUTER stream-stream join: clicks with no purchase in the
    // window survive with NULLs (in streaming, emitted once the
    // watermark proves no match can arrive — state-bounded).
    "q_stream_join_outer" -> { (s, dir) =>
      Streams.clickPurchaseLeftJoin(events(s, dir))
    },

    // Streaming dedup (dropDuplicatesWithinWatermark in stream mode;
    // distinct in batch — same key set either way).
    "q_stream_dedup" -> { (s, dir) =>
      Streams.dedupEvents(events(s, dir))
    },

    // Custom state machine (flatMapGroupsWithState): per-user session and
    // event counts with a 30-minute gap.
    "q_stream_stateful_sessions" -> { (s, dir) =>
      import s.implicits._
      val ds = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[Streams.Ev]
      Streams.statefulSessionCounts(ds, gapSeconds = 1800L).toDF()
    },

    // Bounded-state sessionization: one row per completed session
    // (EventTimeTimeout-evicted state in streaming; single pass in batch).
    "q_stream_sessionize" -> { (s, dir) =>
      import s.implicits._
      val ds = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[Streams.Ev]
      Streams.statefulSessionize(ds, gapSeconds = 1800L).toDF()
    },

    // transformWithState (arbitrary-state v2 API): per-user running
    // totals in a typed ValueState; batch result == groupBy aggregate.
    "q_stream_tws_totals" -> { (s, dir) =>
      import s.implicits._
      val ds = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[Streams.Ev]
      Streams.twsRunningTotals(ds).toDF()
    },

    // Stream-static enrichment: events broadcast-joined to the static
    // customer dimension, then watermarked 6-hour windowed counts per
    // market segment.
    "q_stream_enrich" -> { (s, dir) =>
      Streams.enrichedSegmentCounts(events(s, dir), t(s, dir, "customer"))
    },

    // transformWithState with COMPOSABLE named state (ListState top-k +
    // ValueState counter): per-user all-time top-3 event values.
    "q_stream_tws_topk" -> { (s, dir) =>
      import s.implicits._
      val ds = events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"))
        .as[Streams.EvV]
      Streams.twsTopKValues(ds, k = 3).toDF()
    },

    // transformWithState with MAP state: per-user event-type histogram.
    "q_stream_tws_map" -> { (s, dir) =>
      import s.implicits._
      val ds = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[Streams.Ev]
      Streams.twsTypeCounts(ds).toDF()
    })

  val oracles: Map[String, String] = Map(
    "q_stream_window_counts" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start,
        |  time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS w_end,
        |  event_type,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST("value" AS DECIMAL(14,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q_stream_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, MIN(ts) AS s_start,
        |  MAX(ts) + INTERVAL '30 minutes' AS s_end, COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,

    "q_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "q_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type, "value" FROM events)
        |SELECT c.user_id, c.event_id AS click_id, p.event_id AS p_id, p."value"
        |FROM e c JOIN e p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE""".stripMargin,

    "q_stream_join_outer" ->
      """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, "value"
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id AS click_id, p.event_id AS p_id, p."value"
        |FROM c LEFT JOIN p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE""".stripMargin,

    "q_stream_stateful_sessions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e)
        |SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM m GROUP BY user_id""".stripMargin,

    "q_stream_tws_totals" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(FLOOR("value" * 1000) AS BIGINT)) AS BIGINT) AS sum_q
        |FROM events GROUP BY user_id""".stripMargin,

    "q_stream_enrich" ->
      """SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS w_start,
        |  time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) + INTERVAL '6 hours' AS w_end,
        |  c_mktsegment, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(FLOOR("value" * 1000) AS BIGINT)) AS BIGINT) AS sum_q
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_stream_tws_topk" ->
      """WITH v AS (SELECT user_id, event_id,
        |    CAST(FLOOR("value" * 1000) AS BIGINT) AS vq FROM events),
        |n AS (SELECT user_id, COUNT(*) AS n_seen FROM v GROUP BY 1)
        |SELECT v.user_id, n.n_seen,
        |  CAST(row_number() OVER (PARTITION BY v.user_id
        |    ORDER BY vq DESC, event_id) AS BIGINT) AS rk,
        |  vq, event_id
        |FROM v JOIN n USING (user_id) QUALIFY rk <= 3""".stripMargin,

    "q_stream_tws_map" ->
      """SELECT user_id, event_type, COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_stream_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin)
}

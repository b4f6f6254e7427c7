package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.Q
import graft.streaming.Streams

/** Incremental (MemoryStream) execution of the streaming operators must
  * converge to the batch answer over the same data once all input is
  * processed — that equivalence is what lets the DuckDB oracle check
  * the batch path in StreamQueries.
  */
case class EvId(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
    event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def eventRows = {
    import spark.implicits._
    Q.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Streams.Ev].collect().toSeq
  }

  test("windowedTypeCounts: streaming result == batch result") {
    import spark.implicits._
    val batchIn = Q.events(spark, sf)
    val expected = Streams.windowedTypeCounts(batchIn)
      .collect().map(_.toString).sorted

    val ms = MemoryStream[Streams.Ev](spark)
    val rows = eventRows.toArray
    // two batches: watermark advances between them; no late data beyond
    // watermark (input is fed in ts order per batch)
    val (a, b) = rows.sortBy(_.ts.getTime).splitAt(rows.length / 2)
    val sq = Streams.windowedTypeCounts(ms.toDF())
      .writeStream.format("memory").queryName("wtc")
      .outputMode("complete").start()
    ms.addData(a: _*); sq.processAllAvailable()
    ms.addData(b: _*); sq.processAllAvailable()
    sq.stop()
    val got = spark.table("wtc").collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("enrichedSegmentCounts: stream-static join == batch result") {
    import spark.implicits._
    val dim = spark.read.parquet(s"$sf/customer.parquet")
    val expected = Streams.enrichedSegmentCounts(Q.events(spark, sf), dim)
      .collect().map(_.toString).sorted

    val ms = MemoryStream[Streams.Ev](spark)
    val rows = eventRows.toArray
    val (a, b) = rows.sortBy(_.ts.getTime).splitAt(rows.length / 2)
    val sq = Streams.enrichedSegmentCounts(ms.toDF(), dim)
      .writeStream.format("memory").queryName("enrich")
      .outputMode("complete").start()
    ms.addData(a: _*); sq.processAllAvailable()
    ms.addData(b: _*); sq.processAllAvailable()
    sq.stop()
    val got = spark.table("enrich").collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("statefulSessionCounts: streaming update-mode final state == batch sessionize") {
    import spark.implicits._
    val rows = eventRows.sortBy(_.ts.getTime)
    val expected = graft.operators.Relational
      .sessionCounts(Q.events(spark, sf), "user_id", "ts", "event_id", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    val ms = MemoryStream[Streams.Ev](spark)
    val sq = Streams.statefulSessionCounts(ms.toDS(), 1800L)
      .writeStream.format("memory").queryName("ssc")
      .outputMode("update").start()
    // three micro-batches in event-time order: state must carry across
    val third = rows.length / 3
    ms.addData(rows.take(third): _*); sq.processAllAvailable()
    ms.addData(rows.slice(third, 2 * third): _*); sq.processAllAvailable()
    ms.addData(rows.drop(2 * third): _*); sq.processAllAvailable()
    sq.stop()
    // update mode emits one row per user per batch; final state = last
    val got = spark.table("ssc")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
      .select(col("user_id"), col("s.n_sessions"), col("s.n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("statefulSessionize: streaming (with event-time eviction) == batch sessions") {
    import spark.implicits._
    val batchIn = Q.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Streams.Ev]
    val expected = Streams.statefulSessionize(batchIn, 1800L)
      .toDF().collect().map(_.toString).sorted

    val rows = eventRows.sortBy(_.ts.getTime)
    // a sentinel user far in the future advances the watermark past every
    // real session close, forcing EventTimeTimeout to fire and emit the
    // final open session of each user (and evict their state)
    val maxTs = rows.map(_.ts.getTime).max
    val sentinel = Streams.Ev(-1L,
      new java.sql.Timestamp(maxTs + 86400000L), "click", 0.0)

    val ms = MemoryStream[Streams.Ev](spark)
    val sq = Streams.statefulSessionize(ms.toDS(), 1800L)
      .writeStream.format("memory").queryName("ssz")
      .outputMode("append").start()
    val third = rows.length / 3
    ms.addData(rows.take(third): _*); sq.processAllAvailable()
    ms.addData(rows.slice(third, 2 * third): _*); sq.processAllAvailable()
    ms.addData(rows.drop(2 * third): _*); sq.processAllAvailable()
    ms.addData(sentinel); sq.processAllAvailable()
    // one more empty-ish pass so the timeout fires after the watermark
    // from the sentinel batch is committed
    ms.addData(sentinel); sq.processAllAvailable()
    sq.stop()
    val got = spark.table("ssz").where(col("user_id") >= 0L)
      .collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("twsTypeCounts: MapState histogram streaming == batch groupBy") {
    import spark.implicits._
    val expected = Q.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      val rows = eventRows.sortBy(_.ts.getTime)
      val ms = MemoryStream[Streams.Ev](spark)
      val sq = Streams.twsTypeCounts(ms.toDS())
        .writeStream.format("memory").queryName("twsmap")
        .outputMode("update").start()
      val half = rows.length / 2
      ms.addData(rows.take(half): _*); sq.processAllAvailable()
      ms.addData(rows.drop(half): _*); sq.processAllAvailable()
      sq.stop()
      // counts only grow: max per (user, type) = final histogram
      val got = spark.table("twsmap")
        .groupBy("user_id", "event_type").agg(max(col("cnt")).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(got.toSeq == expected.toSeq)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("twsSessionizeTimers: event-time timers == batch sessions (v2 API)") {
    import spark.implicits._
    val batchIn = Q.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Streams.Ev]
    val expected = Streams.statefulSessionize(batchIn, 1800L)
      .toDF().collect().map(_.toString).sorted

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      val rows = eventRows.sortBy(_.ts.getTime)
      val maxTs = rows.map(_.ts.getTime).max
      val sentinel = Streams.Ev(-1L,
        new java.sql.Timestamp(maxTs + 86400000L), "click", 0.0)
      val ms = MemoryStream[Streams.Ev](spark)
      val sq = Streams.twsSessionizeTimers(ms.toDS(), 1800L)
        .writeStream.format("memory").queryName("twstimer")
        .outputMode("append").start()
      val third = rows.length / 3
      ms.addData(rows.take(third): _*); sq.processAllAvailable()
      ms.addData(rows.slice(third, 2 * third): _*); sq.processAllAvailable()
      ms.addData(rows.drop(2 * third): _*); sq.processAllAvailable()
      // sentinel advances the watermark past every session close; one
      // more batch so the committed watermark drives the timers
      ms.addData(sentinel); sq.processAllAvailable()
      ms.addData(sentinel); sq.processAllAvailable()
      sq.stop()
      val got = spark.table("twstimer").where(col("user_id") >= 0L)
        .collect().map(_.toString).sorted
      assert(got.toSeq == expected.toSeq)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("clickPurchaseJoin: stream-stream interval join == batch join") {
    import spark.implicits._
    val full = Q.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val expected = Streams.clickPurchaseJoin(full)
      .collect().map(_.toString).sorted
    val rows = full.as[EvId].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[EvId](spark)
    val sq = Streams.clickPurchaseJoin(ms.toDF())
      .writeStream.format("memory").queryName("cpj")
      .outputMode("append").start()
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a.toIndexedSeq: _*); sq.processAllAvailable()
    ms.addData(b.toIndexedSeq: _*); sq.processAllAvailable()
    sq.stop()
    val got = spark.table("cpj").collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("clickPurchaseLeftJoin: unmatched clicks emit NULLs once watermark passes") {
    import spark.implicits._
    val full = Q.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val expected = Streams.clickPurchaseLeftJoin(full)
      .collect().map(_.toString).sorted
    val rows = full.as[EvId].collect().sortBy(_.ts.getTime)
    // sentinel far in the future: the watermark passes every click's
    // match window, so all unmatched clicks flush their NULL rows
    val maxTs = rows.map(_.ts.getTime).max
    val sentinel = EvId(-1L, -1L,
      new java.sql.Timestamp(maxTs + 86400000L), "noop", 0.0)
    val ms = MemoryStream[EvId](spark)
    val sq = Streams.clickPurchaseLeftJoin(ms.toDF())
      .writeStream.format("memory").queryName("cplj")
      .outputMode("append").start()
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a.toIndexedSeq: _*); sq.processAllAvailable()
    ms.addData(b.toIndexedSeq: _*); sq.processAllAvailable()
    ms.addData(sentinel); sq.processAllAvailable()
    ms.addData(sentinel); sq.processAllAvailable()
    sq.stop()
    val got = spark.table("cplj").where(col("user_id") >= 0)
      .collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
    // and it genuinely contains unmatched (NULL-extended) clicks
    assert(spark.table("cplj").where(col("p_id").isNull).count() > 0)
  }

  test("dedupEvents: streaming dropDuplicatesWithinWatermark == batch distinct") {
    import spark.implicits._
    val expected = Streams.dedupEvents(Q.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rows = eventRows.sortBy(_.ts.getTime)
    val ms = MemoryStream[Streams.Ev](spark)
    val sq = Streams.dedupEvents(ms.toDF())
      .writeStream.format("memory").queryName("sdd")
      .outputMode("append").start()
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a: _*); sq.processAllAvailable()
    ms.addData(b: _*); sq.processAllAvailable()
    sq.stop()
    val got = spark.table("sdd")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected)
  }

  test("checkpointed file sink: restart resumes exactly-once (no dupes, no loss)") {
    import spark.implicits._
    val rows = eventRows.toArray
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ms = MemoryStream[Streams.Ev](spark)
    def start() = ms.toDF().select(col("user_id"), col("ts"), col("value"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val third = rows.length / 3
    val q1 = start()
    ms.addData(rows.take(third): _*); q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: earlier batches must NOT re-emit
    val q2 = start()
    ms.addData(rows.slice(third, 2 * third): _*); q2.processAllAvailable()
    ms.addData(rows.drop(2 * third): _*); q2.processAllAvailable()
    q2.stop()
    val written = spark.read.parquet(out)
    assert(written.count() == rows.length.toLong)
    assert(written.select("user_id", "ts", "value").distinct().count() ==
      spark.createDataset(rows.toIndexedSeq).toDF()
        .select("user_id", "ts", "value").distinct().count())
  }

  test("twsRunningTotals: transformWithState streaming (RocksDB) == batch aggregate") {
    import spark.implicits._
    val expected = Q.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = eventRows.sortBy(_.ts.getTime)
      val ms = MemoryStream[Streams.Ev](spark)
      val sq = Streams.twsRunningTotals(ms.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      val third = rows.length / 3
      ms.addData(rows.take(third): _*); sq.processAllAvailable()
      ms.addData(rows.slice(third, 2 * third): _*); sq.processAllAvailable()
      ms.addData(rows.drop(2 * third): _*); sq.processAllAvailable()
      sq.stop()
      // update mode: last emission per user carries the final state
      val got = spark.table("tws")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("sum_q"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.sum_q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq == expected.toSeq)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("twsTopKValues: ListState top-k streaming == batch window top-k") {
    import spark.implicits._
    val expected = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("vq").desc, col("event_id").asc)
      Q.events(spark, sf)
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 1000).cast("long").as("vq"))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(2), r.getLong(1)))
        .sorted
    }
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      val rows = Q.events(spark, sf)
        .select(col("user_id"), col("event_id"), col("value"))
        .as[Streams.EvV].collect().sortBy(_.event_id)
      val ms = MemoryStream[Streams.EvV](spark)
      val sq = Streams.twsTopKValues(ms.toDS(), k = 3)
        .writeStream.format("memory").queryName("twstopk")
        .outputMode("update").start()
      val half = rows.length / 2
      ms.addData(rows.take(half): _*); sq.processAllAvailable()
      ms.addData(rows.drop(half): _*); sq.processAllAvailable()
      sq.stop()
      // final emission per user = rows carrying that user's max n_seen
      val w2 = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val got = spark.table("twstopk")
        .withColumn("mx", max(col("n_seen")).over(w2))
        .where(col("n_seen") === col("mx"))
        .select("user_id", "rk", "vq", "event_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted
      assert(got.toSeq == expected.toSeq)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("foreachBatch per-batch-overwrite sink: restart does not duplicate rows") {
    import spark.implicits._
    val rows = eventRows.toArray
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_fb_out").toString
    val ms = MemoryStream[Streams.Ev](spark)
    def start() = Streams.foreachBatchParquetSink(
      ms.toDF().select(col("user_id"), col("ts"), col("value")), out, ckpt)
    val third = rows.length / 3
    val q1 = start()
    ms.addData(rows.take(third): _*); q1.processAllAvailable()
    q1.stop()
    // restart from checkpoint; later batches get fresh ids, and any
    // replayed batch would overwrite its own directory (idempotent)
    val q2 = start()
    ms.addData(rows.slice(third, 2 * third): _*); q2.processAllAvailable()
    ms.addData(rows.drop(2 * third): _*); q2.processAllAvailable()
    q2.stop()
    val written = spark.read.parquet(out)
    assert(written.count() == rows.length.toLong)
    assert(written.select("user_id", "ts", "value").except(
      spark.createDataset(rows.toIndexedSeq).toDF()
        .select("user_id", "ts", "value")).count() == 0)
  }

  test("sessionWindowStats batch == manual gaps-and-islands") {
    val ev = Q.events(spark, sf)
    val got = Streams.sessionWindowStats(ev).groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val manual = graft.operators.Relational
      .sessionCounts(ev, "user_id", "ts", "event_id", 1800L)
    val diff = got.join(manual, "user_id")
      .where(got("n_sessions") =!= manual("n_sessions") ||
        got("n_events") =!= manual("n_events"))
    assert(diff.count() == 0)
    assert(got.count() == manual.count())
  }

  test("streaming near-dup: incremental candidates + per-batch verify == batch minhash dedup") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val expected = graft.operators.Dedup
      .minhashDedupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)

    val ms = MemoryStream[(Long, String)](spark)
    // no TTL on a stream must be a LOUD choice: the default refuses
    val refuse = intercept[IllegalArgumentException] {
      Streams.nearDupCandidatesStream(ms.toDF().toDF("doc_id", "text"))
    }
    assert(refuse.getMessage.contains("stateTtl"), refuse.getMessage)
    val sq = Streams.nearDupCandidatesStream(
        ms.toDF().toDF("doc_id", "text"), unboundedStateOk = true)
      .writeStream.format("memory").queryName("ndcands")
      .outputMode("append").start()
    // two ingest batches in doc_id order: batch 2 docs are matched
    // against batch 1 state WITHOUT recomputing batch 1 signatures
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val (a, b) = rows.splitAt(rows.length / 2)
    ms.addData(a: _*); sq.processAllAvailable()
    ms.addData(b: _*); sq.processAllAvailable()
    sq.stop()

    val got = Streams.verifyNearDupCandidates(
        spark.table("ndcands"), docs)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("ingestDedupStream: per-batch admit + index append catches dups across batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest-spec-")
      .toString
    val t1 = "alpha beta gamma delta epsilon zeta"
    val t3 = "omicron pi rho sigma tau upsilon"
    val t4 = "kappa lambda mu nu xi phi"
    val t5 = "chi psi omega aleph bet gimel"
    val t6 = "dalet he vav zayin het tet"

    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestDedupStream(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/bandidx", s"$tmp/admitted", s"$tmp/ckpt")
    // batch 0: 2 dups 1 (within-batch, larger id loses); 3 novel
    ms.addData((1L, t1), (2L, t1), (3L, t3)); sq.processAllAvailable()
    // batch 1: 10 dups ADMITTED 1 (via the index built from batch 0);
    // 14 dups 13 within the batch (first-keeper greedy)
    ms.addData((10L, t1), (11L, t4), (13L, t5), (14L, t5))
    sq.processAllAvailable()
    // batch 2: 20 dups 11 — admitted in batch 1, so this catch proves
    // the APPEND path (batch 1's signatures were folded into the index)
    ms.addData((20L, t4), (21L, t6)); sq.processAllAvailable()
    sq.stop()

    val got = spark.read.parquet(s"$tmp/admitted")
      .select(col("doc_id"), col("batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (3L, 0L), (11L, 1L), (13L, 1L), (21L, 2L)),
      s"admitted set wrong: $got")

    // replaying a batch's step directly (foreachBatch re-delivery after
    // a crash) must not change the admitted table: same admitted set,
    // same single batch=2 directory (overwritten, not duplicated)
    graft.operators.Dedup.ingestDedupBatch(
      Seq((20L, t4), (21L, t6)).toDF("doc_id", "text"), 2L,
      s"$tmp/bandidx", s"$tmp/admitted")
    val replayed = spark.read.parquet(s"$tmp/admitted")
      .select(col("doc_id"), col("batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replayed == got, s"replay changed the admitted table: $replayed")
  }

  test("ingestCardStream: stored card tracks every batch, in-loop compaction, equals the batch card") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft-card-spec-")
      .toString
    // cross-BATCH duplicate (1 vs 20) and cross-SOURCE duplicate
    // (3 vs 21): the corpus-wide dup rule must see both retroactively
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "web"),
      (2L, "the quick brown fox jumps over the lazy dog today", "web"),
      (3L, "shared exact text across sources here", "web"),
      (10L, "el perro grande de la casa es muy bonito y los gatos", "books"),
      (11L, "one two three four five six seven eight nine ten", "books"),
      (20L, "alpha beta gamma delta epsilon zeta", "web"),
      (21L, "shared exact text across sources here", "books"))
    val ms = MemoryStream[(Long, String, String)](spark)
    val sq = Streams.ingestCardStream(
      ms.toDF().toDF("doc_id", "text", "source"),
      s"$tmp/card", s"$tmp/ckpt", compactEvery = 2,
      calibrationPath = Some(s"$tmp/calhist"))
    ms.addData(rows.take(3): _*); sq.processAllAvailable()
    ms.addData(rows.slice(3, 5): _*); sq.processAllAvailable()
    ms.addData(rows.drop(5): _*); sq.processAllAvailable()
    sq.stop()
    def card(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long, Long, Long, String, Long)] =
      df.select("source", "n_docs", "n_tokens", "avg_tok_c", "keep_ppm",
        "dup_ppm", "top_lang", "top_lang_ppm").as[(String, Long, Long, Long, Long, Long, String, Long)].collect().toSet
    val want = card(TextAnalysis.datasetCard(
      rows.toDF("doc_id", "text", "source"), "doc_id", "text", "source"))
    assert(card(TextAnalysis.cardFromIndex(spark, s"$tmp/card")) === want)
    // the dup rule fired across batches AND sources: web docs 1, 20
    // (cross-batch pair) and 3 (cross-source copy of 21) = 3 of 4;
    // books doc 21 = 1 of 3
    val dup = want.map(r => r._1 -> r._6).toMap
    assert(dup("web") === 750000L && dup("books") === 333333L, s"$dup")
    // compactEvery=2 fired after batch 1: stats holds the compacted
    // dir plus at most the batches after the fold point
    val statDirs = new java.io.File(s"$tmp/card/stats").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(statDirs.contains("batch=-1") && statDirs.length <= 3,
      s"stats dirs: $statDirs")
    // the SAME loop maintained the calibration histogram: release
    // thresholds from the stream-built index == a one-shot batch build
    val oneShot = java.nio.file.Files.createTempDirectory("graft-cal-os-")
      .toString + "/hist"
    TextAnalysis.appendToCalibrationIndex(rows.toDF("doc_id", "text",
      "source"), "doc_id", "text", "source", oneShot, 0L)
    def thr(p: String) = TextAnalysis.calibrationThresholds(spark, p, 32768L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(thr(s"$tmp/calhist") === thr(oneShot))
  }

  test("ingestMemorizationStream: risk is retroactive across batches; " +
      "in-loop compaction commutes with the read; equals the batch audit") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft-mem-spec-")
      .toString
    val b0 = Seq((1L, "a b c d e"), (2L, "p q r s t"))
    val b1 = Seq((10L, "a b c z z"))       // repeats doc 1's "a b c"
    val b2 = Seq((20L, "fresh words only here now"))
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestMemorizationStream(
      ms.toDF().toDF("doc_id", "text"),
      s"$tmp/mem", s"$tmp/ckpt", n = 3, compactEvery = 2)
    ms.addData(b0: _*); sq.processAllAvailable()
    ms.addData(b1: _*); sq.processAllAvailable()
    ms.addData(b2: _*); sq.processAllAvailable()
    sq.stop()
    def audit(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_grams", "n_unique", "risk_ppm")
        .as[(Long, Long, Long, Long)].collect().toSet
    val want = audit(TextAnalysis.memorizationRisk(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", n = 3))
    val got = audit(TextAnalysis.memorizationFromIndex(spark, s"$tmp/mem"))
    assert(got === want)
    // retroactivity visible: doc 1's "a b c" stopped being unique when
    // batch 1 landed
    assert(got.find(_._1 == 1L).get._4 === 666666L)
    // compactEvery=2 fired after batch 1: grams holds the compacted
    // dir plus at most the batches after the fold point
    val gramDirs = new java.io.File(s"$tmp/mem/grams").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(gramDirs.contains("batch=-1") && gramDirs.length <= 3,
      s"grams dirs: $gramDirs")
    // a second explicit compaction (all batches) still reads the same
    TextAnalysis.compactMemorizationIndex(spark, s"$tmp/mem",
      keepLast = 0)
    assert(audit(TextAnalysis.memorizationFromIndex(spark, s"$tmp/mem"))
      === want)
  }

  test("ingestContainmentStream: quotation dups caught across batches; replay folds nothing twice") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cont-spec-")
      .toString
    val t1 = "alpha beta gamma delta epsilon zeta"
    val c1 = "alpha beta gamma delta" // grams ⊂ t1 (containment 1.0)
    val c2 = "beta gamma delta epsilon" // grams ⊂ t1
    val t3 = "omicron pi rho sigma tau upsilon"
    val t4 = "kappa lambda mu nu xi phi"
    val big = "intro kappa lambda mu nu xi phi outro" // CONTAINS t4
    val t6 = "dalet he vav zayin het tet"

    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestContainmentStream(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/contidx", s"$tmp/admitted", s"$tmp/ckpt")
    // batch 0: 2 is contained in 1 (within-batch, larger id loses)
    ms.addData((1L, t1), (2L, c1), (3L, t3)); sq.processAllAvailable()
    // batch 1: 10 contained in ADMITTED 1 via the stored index; 11 novel
    ms.addData((10L, c2), (11L, t4)); sq.processAllAvailable()
    // batch 2: 20 CONTAINS batch-1-admitted 11 (the asymmetric case,
    // and the APPEND path — 11's postings were folded in batch 1)
    ms.addData((20L, big), (21L, t6)); sq.processAllAvailable()
    sq.stop()

    val got = spark.read.parquet(s"$tmp/admitted")
      .select(col("doc_id"), col("batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (3L, 0L), (11L, 1L), (21L, 2L)),
      s"admitted set wrong: $got")

    // crash replay: same admitted table AND an idempotent index fold —
    // gram-set rows must not duplicate
    val gsetsBefore = spark.read.parquet(s"$tmp/contidx.gsets").count()
    graft.operators.Dedup.ingestContainmentBatch(
      Seq((20L, big), (21L, t6)).toDF("doc_id", "text"), 2L,
      s"$tmp/contidx", s"$tmp/admitted")
    val replayed = spark.read.parquet(s"$tmp/admitted")
      .select(col("doc_id"), col("batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replayed == got, s"replay changed the admitted table: $replayed")
    val gsetsAfter = spark.read.parquet(s"$tmp/contidx.gsets").count()
    assert(gsetsAfter == gsetsBefore,
      s"replay duplicated index rows: $gsetsBefore -> $gsetsAfter")
  }

  test("ingestContainmentStream checkDriftEvery: quiet batch appends; shifted batch rebuilds the index in-loop") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cont-drift-")
      .toString
    def parts(path: String): Set[String] =
      new java.io.File(path).listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    // base vocabulary docs — each shares grams with the others so the
    // stored gram distribution is well-populated
    val baseDocs = Seq.tabulate(8)(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota"))
    val onDist = Seq((100L, "beta gamma delta epsilon zeta eta theta"))
    val shifted = Seq.tabulate(6)(i =>
      (200L + i, s"zebra quagga okapi tapir capuchin marmoset lemur m$i"))
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestContainmentStream(
      ms.toDF().toDF("doc_id", "text"), s"$tmp/idx", s"$tmp/admitted",
      s"$tmp/ckpt", checkDriftEvery = 1, maxDriftPpm = 1000000L,
      driftMinCount = 1L)
    ms.addData(baseDocs: _*); sq.processAllAvailable()
    val partsAfterBuild = parts(s"$tmp/idx")
    // batch 1 shares the vocabulary: drift quiet, index grows by
    // APPEND — the build files survive
    ms.addData(onDist: _*); sq.processAllAvailable()
    assert(partsAfterBuild.subsetOf(parts(s"$tmp/idx")),
      "quiet batch must append, not rewrite the index")
    // batch 2 is a disjoint-vocabulary shift: the in-loop alarm fires
    // and the index is REBUILT from the admitted corpus — the old
    // part files are gone
    ms.addData(shifted: _*); sq.processAllAvailable()
    sq.stop()
    assert(partsAfterBuild.intersect(parts(s"$tmp/idx")).isEmpty,
      "shifted batch must rebuild the index in-loop")
    // the rebuilt index equals a manual rebuild over the same corpus
    val admitted = spark.read.parquet(s"$tmp/admitted")
      .select("doc_id", "text")
    graft.operators.Dedup.rebuildContainmentIndex(admitted,
      s"$tmp/manual", "doc_id", "text")
    def postings(path: String) = spark.read.parquet(path)
      .select("gh", "doc_id", "__df", "__r", "__sz")
      .collect().map(_.toString).sorted.toSeq
    assert(postings(s"$tmp/idx") === postings(s"$tmp/manual"),
      "in-loop rebuild must equal a manual rebuild (global-df ranks)")
    // and the loop still works after the rebuild: a doc contained in
    // an admitted one is rejected through the REBUILT index
    graft.operators.Dedup.ingestContainmentBatch(
      Seq((900L, "zebra quagga okapi tapir capuchin")).toDF("doc_id", "text"),
      3L, s"$tmp/idx", s"$tmp/admitted")
    val ids = spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(900L),
      "contained doc must be rejected through the rebuilt index")
  }

  test("ingestBm25Stream: quiet batches leave the rebuild-only index alone; shifted batch rebuilds to a fresh-build match") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-loop-")
      .toString
    def parts(path: String): Set[String] =
      new java.io.File(path).listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val base = Seq.tabulate(10)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val onDist = Seq((100L, "the lazy dog jumps over the quick brown fox"))
    val shifted = Seq.tabulate(10)(i =>
      (200L + i, "zebra quagga okapi tapir capuchin marmoset lemur"))
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestBm25Stream(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/idx", s"$tmp/corpus", s"$tmp/ckpt", checkDriftEvery = 1,
      driftMinCount = 1L)
    ms.addData(base: _*); sq.processAllAvailable()
    val partsAfterBuild = parts(s"$tmp/idx")
    // on-distribution batch: the alarm stays quiet and the rebuild-only
    // index is NOT touched (this loop never appends by design)
    ms.addData(onDist: _*); sq.processAllAvailable()
    assert(parts(s"$tmp/idx") === partsAfterBuild,
      "quiet batch must leave the rebuild-only index untouched")
    // shifted batch: alarm fires, full rebuild from the corpus root
    ms.addData(shifted: _*); sq.processAllAvailable()
    sq.stop()
    assert(parts(s"$tmp/idx").intersect(partsAfterBuild).isEmpty,
      "shifted batch must rebuild the index")
    // the rebuilt index answers identically to a fresh build over the
    // accumulated corpus (base + onDist + shifted)
    val corpus = (base ++ onDist ++ shifted).toDF("doc_id", "text")
    val queries = Seq((1L, "lazy dog"), (2L, "zebra okapi"))
      .toDF("query_id", "qtext")
    def rows(path: String) = graft.operators.Retrieval.bm25TopKIndexed(
        spark, corpus, "doc_id", "text", path, queries, k = 5)
      .collect().map(_.toString).sorted.toSeq
    graft.operators.Retrieval.writeBm25Index(corpus, "doc_id", "text",
      s"$tmp/fresh")
    assert(rows(s"$tmp/idx") === rows(s"$tmp/fresh"),
      "in-loop rebuild must equal a fresh build")
  }

  test("ingestQuantizedStream: appended int8 index == one-shot build (exact append, no alarm needed)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-int8-loop-")
      .toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val lo = emb.where(col("vec_id") < 300L)
      .as[(Long, Seq[Float])].collect().toSeq
    val hi = emb.where(col("vec_id") >= 300L && col("vec_id") < 600L)
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])](spark)
    val sq = Streams.ingestQuantizedStream(
      ms.toDF().toDF("vec_id", "embedding"), s"$tmp/idx", s"$tmp/corpus",
      s"$tmp/ckpt")
    ms.addData(lo: _*); sq.processAllAvailable()
    ms.addData(hi: _*); sq.processAllAvailable()
    sq.stop()
    val both = emb.where(col("vec_id") < 600L)
    val probes = Seq(0L, 7L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val viaLoop = rows(graft.operators.Similarity.quantizedTopKIndexedBatch(
      spark, both, "vec_id", "embedding", s"$tmp/idx", probes, 10))
    val inMem = rows(graft.operators.Similarity.quantizedTopKBatch(
      both, "vec_id", "embedding", probes, 10))
    assert(viaLoop === inMem,
      "stream-built int8 index must answer identically to in-memory")
  }

  test("ingestSignStream: appended sign index == one-shot build (exact append, no alarm needed)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sign-loop-")
      .toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val lo = emb.where(col("vec_id") < 300L)
      .as[(Long, Seq[Float])].collect().toSeq
    val hi = emb.where(col("vec_id") >= 300L && col("vec_id") < 600L)
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])](spark)
    val sq = Streams.ingestSignStream(
      ms.toDF().toDF("vec_id", "embedding"), s"$tmp/idx", s"$tmp/corpus",
      s"$tmp/ckpt")
    ms.addData(lo: _*); sq.processAllAvailable()
    ms.addData(hi: _*); sq.processAllAvailable()
    sq.stop()
    val both = emb.where(col("vec_id") < 600L)
    val probes = Seq(0L, 7L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val viaLoop = rows(graft.operators.Similarity.hammingTopKIndexedBatch(
      spark, both, "vec_id", "embedding", s"$tmp/idx", probes, 10))
    val inMem = rows(graft.operators.Similarity.hammingTopKBatch(
      both, "vec_id", "embedding", probes, 10))
    assert(viaLoop === inMem,
      "stream-built sign index must answer identically to in-memory")
    // replay of an absorbed batch appends nothing (stored-id anti-join)
    val n1 = spark.read.parquet(s"$tmp/idx").count()
    graft.operators.Similarity.ingestSignBatch(
      hi.toDF("vec_id", "embedding"), 1L, s"$tmp/idx", s"$tmp/corpus")
    assert(spark.read.parquet(s"$tmp/idx").count() === n1,
      "replayed batch must fold zero new codes")
  }

  test("ingestCodeStream: loop-built perceptual-code index == one-shot build; replay appends nothing") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-code-loop-")
      .toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val codes = graft.operators.Multimodal.imageAHash(
        graft.operators.Multimodal.pngTable(docs)).toDF()
      .select(col("doc_id"), col("phash").as("code"))
      .as[(Long, Long)].collect().toSeq
    val (lo, hi) = codes.partition(_._1 % 2 == 0)
    val ms = MemoryStream[(Long, Long)](spark)
    val sq = Streams.ingestCodeStream(ms.toDF().toDF("doc_id", "code"),
      s"$tmp/idx", s"$tmp/corpus", s"$tmp/ckpt")
    ms.addData(lo: _*); sq.processAllAvailable()
    ms.addData(hi: _*); sq.processAllAvailable()
    sq.stop()
    val stored = spark.read.parquet(s"$tmp/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(stored === codes.sorted,
      "loop-built code table must equal the one-shot code set")
    // replay of an absorbed batch appends nothing
    graft.operators.Multimodal.ingestCodeBatch(
      hi.toDF("doc_id", "code"), 1L, s"$tmp/idx", s"$tmp/corpus")
    assert(spark.read.parquet(s"$tmp/idx").count() === codes.length.toLong)
  }

  test("ingestFrameStream: loop-built frame index answers containment identically to ad-hoc; replay appends nothing") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-frame-loop-")
      .toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = graft.operators.Multimodal.mediaTable(docs)
      .where(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("content"))
      .unionByName(graft.operators.Multimodal.videoVariantTable(docs))
      .as[graft.operators.Multimodal.MediaRow]
    val all = corpus.collect().toSeq
    val (lo, hi) = all.partition(_.doc_id % 2 == 0)
    val ms = MemoryStream[graft.operators.Multimodal.MediaRow](spark)
    val sq = Streams.ingestFrameStream(ms.toDF(), s"$tmp/idx",
      s"$tmp/corpus", s"$tmp/ckpt")
    ms.addData(lo: _*); sq.processAllAvailable()
    ms.addData(hi: _*); sq.processAllAvailable()
    sq.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(graft.operators.Multimodal.videoNearDupPairsFromIndex(
        spark, s"$tmp/idx"))
      === rows(graft.operators.Multimodal.videoNearDupPairs(corpus.toDF())),
      "stream-built frame index must answer identically to the ad-hoc search")
    // replay of an absorbed batch appends nothing (per-doc anti-join)
    val n1 = spark.read.parquet(s"$tmp/idx").count()
    graft.operators.Multimodal.ingestFrameBatch(
      spark.createDataset(hi).toDF(), 1L, s"$tmp/idx", s"$tmp/corpus")
    assert(spark.read.parquet(s"$tmp/idx").count() === n1,
      "replayed batch must fold zero new frame rows")
  }

  test("ingestChunkStream: streamed manifest replays the direct audit; replay idempotent; in-loop compaction changes nothing") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk-loop-")
      .toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def slice(b: Long) = graft.operators.Multimodal.mediaTable(
        docs.where(expr("(doc_id DIV 3) % 3") === b))
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[graft.operators.Multimodal.MediaRow]
    val ms = MemoryStream[graft.operators.Multimodal.MediaRow](spark)
    val sq = Streams.ingestChunkStream(ms.toDF(), s"$tmp/manifest",
      s"$tmp/ckpt", compactEvery = 3)
    for (b <- 0L to 2L) { ms.addData(slice(b).collect(): _*)
      sq.processAllAvailable() }
    sq.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = rows(graft.operators.Multimodal.mediaRedundancy(
      graft.operators.Multimodal.cdcChunks(
        graft.operators.Multimodal.mediaTable(docs))))
    assert(rows(graft.operators.Multimodal.mediaRedundancyFromIndex(
      spark, s"$tmp/manifest")) === direct,
      "the streamed manifest must replay the direct corpus audit")
    // in-loop compaction fired at batch 2 (compactEvery = 3): batches
    // 0,1 folded into batch=-1 with the folded-ids manifest
    assert(graft.io.Compaction.foldedIds(spark, s"$tmp/manifest")
      === Set(0L, 1L))
    // replay of a folded-away batch id: the per-batch overwrite
    // re-creates only ITS dir — but ensure-level callers skip folded
    // ids, so here we replay the KEPT batch (2), an idempotent
    // overwrite that changes nothing
    graft.operators.Multimodal.appendToChunkIndex(
      graft.operators.Multimodal.mediaTable(
        docs.where(expr("(doc_id DIV 3) % 3") === 2L)),
      s"$tmp/manifest", 2L)
    assert(rows(graft.operators.Multimodal.mediaRedundancyFromIndex(
      spark, s"$tmp/manifest")) === direct)
  }

  test("ingestCdcStream: cross-batch novelty decays as the store absorbs; replayed batch changes neither audit nor store") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdc-loop-")
      .toString
    val ms = MemoryStream[(Long, String, String)](spark)
    val sq = Streams.ingestCdcStream(
      ms.toDF().toDF("doc_id", "media_type", "text")
        .withColumn("content", encode(col("text"), "UTF-8")),
      s"$tmp/store", s"$tmp/audits", s"$tmp/ckpt")
    // VARIED text (a repeated short phrase has only phrase-length many
    // distinct windows — by chance none may fire a cut, leaving the
    // whole doc one chunk and nothing shareable)
    val passage = (1 to 80).map(i => s"shared passage token $i").mkString(" ")
    // batch 0: two docs sharing no content with later arrivals' novel half
    ms.addData((1L, "image", passage + "alpha omega"),
      (2L, "audio", (1 to 40).map(i => s"audio stream word $i").mkString(" ")))
    sq.processAllAvailable()
    // batch 1: doc 3 repeats the stored passage wholesale (a near-copy
    // upload) + one genuinely novel VARIED doc (a repeated phrase
    // would read internally saved — distinct chunks << total)
    val batch1 = Seq((3L, "image", passage + "beta gamma"),
      (4L, "video", (1 to 40).map(i => s"novel video clip $i").mkString(" ")))
    ms.addData(batch1: _*)
    sq.processAllAvailable()
    sq.stop()
    val audits = spark.read.parquet(s"$tmp/audits")
      .select(col("batch").cast("long"), col("media_type"), col("n_chunks"),
        col("novel_chunks"), col("saved_ppm"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // batch 0 wrote everything as novel; batch 1's image doc shares the
    // passage chunks -> the store absorbed most of its bytes
    val (n0, nv0, _) = audits((0L, "image"))
    assert(nv0 > 0 && nv0 <= n0)
    val (_, _, saved1) = audits((1L, "image"))
    assert(saved1 > 500000L,
      s"repeated passage must read mostly saved, got $saved1 ppm")
    assert(audits((1L, "video"))._3 < 500000L,
      "novel content must not read as saved")
    // replay of the absorbed batch: store membership unchanged, audit
    // NOT recomputed (first-delivery-wins — a recompute against the
    // post-fold store would rewrite history to zero novelty)
    val storeN = spark.read.parquet(s"$tmp/store").count()
    val auditBefore = spark.read.parquet(s"$tmp/audits/batch=1")
      .collect().map(_.toString).sorted.toSeq
    graft.operators.Multimodal.ingestCdcBatch(
      batch1.toDF("doc_id", "media_type", "text")
        .withColumn("content", encode(col("text"), "UTF-8")),
      1L, s"$tmp/store", s"$tmp/audits")
    assert(spark.read.parquet(s"$tmp/store").count() === storeN,
      "replayed batch must append nothing to the store")
    assert(spark.read.parquet(s"$tmp/audits/batch=1")
      .collect().map(_.toString).sorted.toSeq === auditBefore,
      "replayed batch must not rewrite its audit")
    // store compaction (the stream's compactEvery maintenance) is an
    // identity rewrite: bounded files, identical membership
    val before = spark.read.parquet(s"$tmp/store")
      .collect().map(_.toString).sorted.toSeq
    graft.io.Compaction.compactDir(spark, s"$tmp/store", targetFiles = 1)
    assert(spark.read.parquet(s"$tmp/store")
      .collect().map(_.toString).sorted.toSeq === before)
  }

  test("ingestSubstringScrubStream: first ARRIVAL owns a span; replay appends nothing") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sub-spec-")
      .toString
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val t1 = "alpha beta gamma delta epsilon zeta"
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestSubstringScrubStream(
      ms.toDF().toDF("doc_id", "text"),
      s"$tmp/ownidx", s"$tmp/scrubbed", s"$tmp/ckpt")
    // batch 0: doc 5 owns t1's spans (sole doc); doc 7 novel
    ms.addData((5L, t1), (7L, "omicron pi rho sigma tau upsilon"))
    sq.processAllAvailable()
    // batch 1: doc 0 quotes t1's prefix — SMALLER id than the owner,
    // but arrival order wins: doc 0 is scrubbed, doc 5's text immutable
    ms.addData((0L, "alpha beta gamma delta epsilon intro words appended"))
    sq.processAllAvailable()
    sq.stop()

    val got = spark.read.parquet(s"$tmp/scrubbed")
      .select("doc_id", "n_removed", "scrubbed_md5")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(5L) === ((0L, m(t1))), "owner must keep its text")
    // doc 0: tokens 0..4 covered by the stored 5-gram "alpha..epsilon"
    assert(got(0L) === ((5L, m("intro words appended"))),
      s"later arrival must lose the quoted span: ${got(0L)}")

    // replay batch 1: same scrub rows, zero new index rows (the
    // owner-compare guard — its own grams are already stored)
    val idxBefore = spark.read.parquet(s"$tmp/ownidx").count()
    graft.operators.TextAnalysis.ingestSubstringScrubBatch(
      Seq((0L, "alpha beta gamma delta epsilon intro words appended"))
        .toDF("doc_id", "text"), 1L, s"$tmp/ownidx", s"$tmp/scrubbed")
    val replayed = spark.read.parquet(s"$tmp/scrubbed")
      .select("doc_id", "n_removed", "scrubbed_md5")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(replayed === got, "replay changed scrub results")
    assert(spark.read.parquet(s"$tmp/ownidx").count() === idxBefore,
      "replay duplicated ownership rows")

    // index compaction: one-dir layout, identical (g, owner) rows, and
    // a post-compaction batch still scrubs against the folded history
    val rowsBefore = spark.read.parquet(s"$tmp/ownidx")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    graft.operators.TextAnalysis.compactSubstringOwnerIndex(spark,
      s"$tmp/ownidx", targetFiles = 2)
    val rowsAfter = spark.read.parquet(s"$tmp/ownidx")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rowsAfter === rowsBefore, "compaction changed ownership rows")
    graft.operators.TextAnalysis.ingestSubstringScrubBatch(
      Seq((30L, "omicron pi rho sigma tau quoting")).toDF("doc_id", "text"),
      2L, s"$tmp/ownidx", s"$tmp/scrubbed")
    val b2 = spark.read.parquet(s"$tmp/scrubbed")
      .where(col("doc_id") === 30L)
      .select("n_removed", "scrubbed_md5").head()
    // "omicron pi rho sigma tau" is doc 7's stored 5-gram -> scrubbed
    assert(b2.getLong(0) === 5L)
    assert(b2.getString(1) === m("quoting"))
  }

  test("driftGatedIngestStream: on-distribution batch admitted, shifted batch quarantined") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-gate-spec-")
      .toString
    val ref = Seq.tabulate(20)(i => (100L + i,
      "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.driftGatedIngestStream(
      ms.toDF().toDF("doc_id", "text"), ref,
      s"$tmp/admitted", s"$tmp/quarantine", s"$tmp/ckpt",
      maxDriftPpm = 500000L, minCount = 1L)
    // batch 0: same vocabulary as the reference -> tiny drift, admitted
    ms.addData((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the lazy dog jumps over the quick brown fox"))
    sq.processAllAvailable()
    // batch 1: disjoint vocabulary -> TV distance ~1 (2e6 ppm), quarantined
    ms.addData((3L, "zebra quagga okapi tapir capuchin marmoset lemur"))
    sq.processAllAvailable()
    sq.stop()

    val admitted = spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet
    val quarantined = spark.read.parquet(s"$tmp/quarantine")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(1L, 2L), s"admitted: $admitted")
    assert(quarantined === Set(3L), s"quarantined: $quarantined")

    // replay the quarantined batch: same deterministic decision, the
    // directory is overwritten not duplicated
    graft.operators.TextAnalysis.driftGatedIngestBatch(
      Seq((3L, "zebra quagga okapi tapir capuchin marmoset lemur"))
        .toDF("doc_id", "text"), 1L, ref,
      s"$tmp/admitted", s"$tmp/quarantine", maxDriftPpm = 500000L,
      minCount = 1L)
    assert(spark.read.parquet(s"$tmp/quarantine")
      .select("doc_id").as[Long].collect().toSet === Set(3L))
    assert(spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("driftGatedIngestStreamStored: gates from the stored counts; reference corpus read once, not per batch") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-gate-stored-")
      .toString
    val refRows = Seq.tabulate(20)(i => (100L + i,
      "the quick brown fox jumps over the lazy dog"))
    refRows.toDF("doc_id", "text").write.parquet(s"$tmp/refdocs")

    // index build: the ONE scan of the reference corpus
    graft.operators.TextAnalysis.writeReferenceCounts(
      spark.read.parquet(s"$tmp/refdocs"), s"$tmp/refcounts")

    // stored counts replay the same exact-integer TV as the recompute
    // form (bit-identical decisions contract)
    val probe = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    def tv(drift: org.apache.spark.sql.DataFrame) = drift
      .agg(coalesce(sum(col("rate_diff_ppm")), lit(0L))).head().getLong(0)
    assert(
      tv(graft.operators.TextAnalysis.termDriftFromCounts(
        spark.read.parquet(s"$tmp/refcounts"), probe, "text", 1L)) ===
      tv(graft.operators.TextAnalysis.termDrift(
        refRows.toDF("doc_id", "text"), probe, "text", 1L)),
      "stored-counts TV differs from recompute TV")

    // DELETE the reference corpus: the stored gate must never touch it
    // again — a per-batch reference scan would throw FileNotFound here
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/refdocs"), true)

    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.driftGatedIngestStreamStored(
      ms.toDF().toDF("doc_id", "text"), s"$tmp/refcounts",
      s"$tmp/admitted", s"$tmp/quarantine", s"$tmp/ckpt",
      maxDriftPpm = 500000L, minCount = 1L)
    ms.addData((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the lazy dog jumps over the quick brown fox"))
    sq.processAllAvailable()
    ms.addData((3L, "zebra quagga okapi tapir capuchin marmoset lemur"))
    sq.processAllAvailable()
    sq.stop()

    assert(spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    assert(spark.read.parquet(s"$tmp/quarantine")
      .select("doc_id").as[Long].collect().toSet === Set(3L))

    // crash replay through the stored batch form: same deterministic
    // decision, directory overwritten not duplicated
    graft.operators.TextAnalysis.driftGatedIngestBatchStored(
      Seq((3L, "zebra quagga okapi tapir capuchin marmoset lemur"))
        .toDF("doc_id", "text"), 1L, s"$tmp/refcounts",
      s"$tmp/admitted", s"$tmp/quarantine", maxDriftPpm = 500000L,
      minCount = 1L)
    assert(spark.read.parquet(s"$tmp/quarantine")
      .select("doc_id").as[Long].collect().toSet === Set(3L))
    assert(spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("gatedIngestDedupStream: shifted batch quarantined whole (index untouched); admitted batch deduped") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-gated-dedup-")
      .toString
    val refText = "the quick brown fox jumps over the lazy dog"
    graft.operators.TextAnalysis.writeReferenceCounts(
      Seq.tabulate(20)(i => (100L + i, refText)).toDF("doc_id", "text"),
      s"$tmp/refcounts")
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.gatedIngestDedupStream(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/refcounts", s"$tmp/quarantine", s"$tmp/bandidx",
      s"$tmp/admitted", s"$tmp/ckpt", maxDriftPpm = 500000L, minCount = 1L)
    // batch 0: on-distribution, contains a within-batch dup pair (2
    // dups 1) -> gated IN, dedup admits {1, 3}
    ms.addData(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the lazy dog naps beside the quick brown fox"))
    sq.processAllAvailable()
    // batch 1: disjoint vocabulary -> quarantined WHOLE; neither the
    // admitted corpus nor the index may grow
    ms.addData((10L, "zebra quagga okapi tapir capuchin marmoset lemur"))
    sq.processAllAvailable()
    sq.stop()

    val admitted = spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(1L, 3L), s"admitted: $admitted")
    assert(spark.read.parquet(s"$tmp/quarantine")
      .select("doc_id").as[Long].collect().toSet === Set(10L))
    // the quarantined batch's signatures never entered the index
    assert(spark.read.parquet(s"$tmp/bandidx")
      .select("doc_id").distinct().as[Long].collect().toSet === Set(1L, 3L))

    // crash replay of the quarantined batch: same branch, overwrite
    graft.operators.Dedup.gatedIngestDedupBatch(
      Seq((10L, "zebra quagga okapi tapir capuchin marmoset lemur"))
        .toDF("doc_id", "text"), 1L, s"$tmp/refcounts",
      s"$tmp/quarantine", s"$tmp/bandidx", s"$tmp/admitted",
      maxDriftPpm = 500000L, minCount = 1L)
    assert(spark.read.parquet(s"$tmp/quarantine")
      .select("doc_id").as[Long].collect().toSet === Set(10L))
    assert(spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("ingestDedupStream compactEvery: file counts bounded over 3x the cadence; results identical") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "omicron pi rho sigma tau upsilon",
      "kappa lambda mu nu xi phi",
      "chi psi omega aleph bet gimel",
      "dalet he vav zayin het tet",
      "yod kaf lamed mem nun samekh")
    // batch i: one novel doc (100+i) + (i>0) one dup of batch i-1's
    // admitted doc — every batch exercises the index ACROSS a
    // compaction boundary
    def batchRows(i: Int) =
      Seq((100L + i, texts(i))) ++
        (if (i > 0) Seq((200L + i, texts(i - 1))) else Seq.empty)

    def run(root: String, every: Int): Set[Long] = {
      val ms = MemoryStream[(Long, String)](spark)
      val sq = Streams.ingestDedupStream(ms.toDF().toDF("doc_id", "text"),
        s"$root/bandidx", s"$root/admitted", s"$root/ckpt",
        compactEvery = every)
      for (i <- 0 until 6) { ms.addData(batchRows(i): _*); sq.processAllAvailable() }
      sq.stop()
      spark.read.parquet(s"$root/admitted")
        .select("doc_id").as[Long].collect().toSet
    }

    val tmpC = java.nio.file.Files.createTempDirectory("graft-cmp-c-").toString
    val tmpU = java.nio.file.Files.createTempDirectory("graft-cmp-u-").toString
    val gotC = run(tmpC, 2) // compaction fires after batches 1, 3, 5
    val gotU = run(tmpU, 0)
    assert(gotC === gotU, s"compaction changed results: $gotC vs $gotU")
    assert(gotC === (0 until 6).map(100L + _).toSet, s"admitted: $gotC")

    // bounded layout: the admitted corpus is batch=-1 + the kept newest
    // dir; the index is one compacted dir of <= 8 data files
    def batchDirs(root: String) = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch="))
      .toSet
    assert(batchDirs(s"$tmpC/admitted") === Set("batch=-1", "batch=5"),
      s"admitted dirs: ${batchDirs(s"$tmpC/admitted")}")
    assert(batchDirs(s"$tmpU/admitted").size === 6)
    val idxFiles = new java.io.File(s"$tmpC/bandidx").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(idxFiles <= 8, s"index data files after compaction: $idxFiles")
  }

  test("containment fold crash window: postings-only append heals on replay, no duplicates") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cont-crash-")
      .toString
    val t1 = "alpha beta gamma delta epsilon zeta"
    val t3 = "omicron pi rho sigma tau upsilon"
    val t4 = "kappa lambda mu nu xi phi"
    // batch 0 builds the index
    graft.operators.Dedup.ingestContainmentBatch(
      Seq((1L, t1), (3L, t3)).toDF("doc_id", "text"), 0L,
      s"$tmp/contidx", s"$tmp/admitted")

    // batch 1, crashed mid-fold: admitted dir written, POSTINGS
    // appended, gram sets NOT (the window the per-table guard closes)
    val b1 = Seq((11L, t4)).toDF("doc_id", "text")
    b1.coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/admitted/batch=1")
    graft.operators.Dedup.appendPostingsFromSets(
      graft.operators.Dedup.gramSetArrays(b1, "doc_id", "text", 3),
      s"$tmp/contidx", coalesceTo = 1)
    val postAfterCrash = spark.read.parquet(s"$tmp/contidx")
      .where(col("doc_id") === 11L).count()
    assert(postAfterCrash > 0)
    assert(spark.read.parquet(s"$tmp/contidx.gsets")
      .where(col("doc_id") === 11L).count() === 0)

    // foreachBatch re-delivers batch 1: postings must NOT duplicate,
    // the missing gram-set half must appear
    graft.operators.Dedup.ingestContainmentBatch(b1, 1L,
      s"$tmp/contidx", s"$tmp/admitted")
    assert(spark.read.parquet(s"$tmp/contidx")
      .where(col("doc_id") === 11L).count() === postAfterCrash,
      "replay duplicated postings rows")
    assert(spark.read.parquet(s"$tmp/contidx.gsets")
      .where(col("doc_id") === 11L).count() === 1,
      "replay did not heal the missing gram-set rows")

    // the healed index still drives admission: a quote of doc 11 is
    // rejected in the next batch
    graft.operators.Dedup.ingestContainmentBatch(
      Seq((20L, "intro kappa lambda mu nu xi phi outro"), (21L, "dalet he vav zayin het tet"))
        .toDF("doc_id", "text"), 2L, s"$tmp/contidx", s"$tmp/admitted")
    val got = spark.read.parquet(s"$tmp/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 3L, 11L, 21L), s"admitted: $got")
  }

  test("ingestIvfStream: streamed embeddings land in the probed index per batch") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-stream-")
      .toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val seed = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 =!= 0)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val centroids = graft.operators.Similarity.ivfWriteIndex(
      seed, "vec_id", "embedding", s"$tmp/idx", 16)

    val ms = MemoryStream[(Long, Seq[Float])](spark)
    val sq = Streams.ingestIvfStream(ms.toDF().toDF("vec_id", "embedding"),
      s"$tmp/idx", s"$tmp/ckpt")
    val (a, b) = rest.splitAt(rest.length / 2)
    ms.addData(a: _*); sq.processAllAvailable()
    // first batch visible to a probe before the second arrives
    val midCount = spark.read.parquet(s"$tmp/idx").count()
    assert(midCount == seed.count() + a.length,
      s"first streamed batch must be probe-visible, got $midCount")
    ms.addData(b: _*); sq.processAllAvailable()
    sq.stop()

    val idx = spark.read.parquet(s"$tmp/idx")
    assert(idx.count() == emb.count())
    assert(idx.select("vec_id").distinct().count() == emb.count())
    // streamed (odd-id) vectors are reachable through the same
    // directory-pruned probe whenever the true top-10 contains them
    val merged = graft.operators.Similarity.ivfQueryIndex(spark, s"$tmp/idx",
        centroids, "vec_id", "embedding", probeId = 0L, k = 10, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = graft.operators.Similarity.bruteForceTopK(spark, emb,
        "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val oddHits = brute.filter(_ % 2 != 0)
    assert(oddHits.isEmpty || (merged intersect oddHits).nonEmpty,
      "streamed vectors must be reachable through the probe")
  }

  test("streaming near-dup TTL: dups pair within horizon; idle buckets evict and reseed") {
    import spark.implicits._
    val txt = "alpha beta gamma delta epsilon zeta"

    // TTL state forces TimeMode.ProcessingTime, under which
    // transformWithState's shouldRunAnotherBatch is always true — with
    // no-data micro-batches enabled the engine schedules empty batches
    // forever and processAllAvailable never unblocks (production runs
    // set a trigger interval, so this only bites test-style unbounded
    // triggers). Disable no-data batches for the duration: TTL expiry
    // is enforced on state READ, so eviction semantics are unchanged.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      // within the horizon (generous TTL): a dup in the next batch pairs
      val msA = MemoryStream[(Long, String)](spark)
      val sqA = Streams.nearDupCandidatesStream(
          msA.toDF().toDF("doc_id", "text"),
          stateTtl = Some(java.time.Duration.ofMinutes(10)))
        .writeStream.format("memory").queryName("ndttl_a")
        .outputMode("append").start()
      msA.addData((1L, txt)); sqA.processAllAvailable()
      msA.addData((2L, txt)); sqA.processAllAvailable()
      sqA.stop()
      val gotA = spark.table("ndttl_a").as[Streams.CandPair]
        .collect().map(p => (p.doc_a, p.doc_b)).toSet
      assert(gotA == Set((1L, 2L)),
        s"dup within the TTL horizon must pair, got $gotA")

      // past the horizon (short TTL + sleep): the bucket evicts — the
      // late dup pairs with NOTHING (recall contract) but reseeds the
      // bucket, so a same-batch follower pairs with the reseeder, not
      // the expired original
      val msB = MemoryStream[(Long, String)](spark)
      val sqB = Streams.nearDupCandidatesStream(
          msB.toDF().toDF("doc_id", "text"),
          stateTtl = Some(java.time.Duration.ofSeconds(3)))
        .writeStream.format("memory").queryName("ndttl_b")
        .outputMode("append").start()
      msB.addData((1L, txt)); sqB.processAllAvailable()
      Thread.sleep(4000) // > ttl: doc 1's buckets expire
      msB.addData((3L, txt), (4L, txt)); sqB.processAllAvailable()
      sqB.stop()
      val gotB = spark.table("ndttl_b").as[Streams.CandPair]
        .collect().map(p => (p.doc_a, p.doc_b)).toSet
      assert(!gotB.contains((1L, 3L)) && !gotB.contains((1L, 4L)),
        s"a dup arriving after its bucket expired must not pair with it, got $gotB")
      assert(gotB.contains((3L, 4L)),
        s"the expired bucket must reseed so fresh dups still pair, got $gotB")
    } finally {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    }
  }

  test("ingestWinnowStream: cross-batch copy suspects; template shift trips the scheduled rebuild") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-winnow-stream-").toString
    val run = "p q r s t u v"
    val b0 = Seq((1L, s"a1 a2 a3 $run a4"), (2L, s"b1 b2 $run b3 b4"))
    val b1 = Seq((10L, s"c1 c2 c3 $run c4 c5")) // copies batch-0's run
    val b2 = (20L until 40L).map(i =>            // new template family
      (i, s"zz1 zz2 zz3 zz4 zz5 zz6 zz7 e$i"))
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestWinnowStream(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/idx", s"$tmp/corpus", s"$tmp/suspects", s"$tmp/ckpt",
      k = 3, w = 3, minShared = 1, maxDf = 50,
      checkDriftEvery = 3, driftThresholdPpm = 500000L)
    ms.addData(b0: _*); sq.processAllAvailable()
    ms.addData(b1: _*); sq.processAllAvailable()
    ms.addData(b2: _*); sq.processAllAvailable()
    sq.stop()
    // batch 0 bootstrapped the index; batch 1's screen caught the
    // copied run against BOTH stored docs
    val sus = spark.read.parquet(s"$tmp/suspects/batch=1")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(sus === Set((1L, 10L), (2L, 10L)))
    // batch 2 ((id+1) % 3 == 0) ran the novelty alarm: an all-new
    // template family reads 1e6 ppm novel -> the index was REBUILT
    // from the accumulated corpus and now covers the family
    val after = graft.operators.Dedup.winnowIndexNoveltyPpm(
      b2.toDF("doc_id", "text"), spark, s"$tmp/idx", "doc_id", "text",
      k = 3, w = 3)
    graft.operators.Caches.release()
    assert(after === 0L, s"rebuild must cover the shifted family: $after")
    // and the rebuilt index equals a from-scratch fingerprint table of
    // everything ingested
    val all = (b0 ++ b1 ++ b2).toDF("doc_id", "text")
    val want = graft.operators.Dedup.winnowFingerprints(all, "doc_id",
      "text", k = 3, w = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = spark.read.parquet(s"$tmp/idx")
      .select("doc_id", "fp").as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("ingestCmsStream + ingestImportanceStream: streamed folds equal batch builds; compaction cadence bounds dirs") {
    import spark.implicits._
    import graft.operators.{Sketches, TextAnalysis}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-addfold-stream-").toString
    val b0 = Seq((1L, "hot hot warm aa bb", "en"), (2L, "hot cc dd ee ff", "en"))
    val b1 = Seq((3L, "hot warm gg hh ii", "fr"), (4L, "hot jj kk ll mm", "fr"))
    val b2 = Seq((5L, "hot warm nn oo pp", "en"))
    val all = (b0 ++ b1 ++ b2).toDF("doc_id", "text", "lang")

    val ms1 = MemoryStream[(Long, String, String)](spark)
    val sq1 = Streams.ingestCmsStream(
      ms1.toDF().toDF("doc_id", "text", "lang"),
      s"$tmp/cms", s"$tmp/ck1", depth = 4, width = 64, candidates = 6,
      compactEvery = 2)
    ms1.addData(b0: _*); sq1.processAllAvailable()
    ms1.addData(b1: _*); sq1.processAllAvailable()
    ms1.addData(b2: _*); sq1.processAllAvailable()
    sq1.stop()
    def heavy(path: String) = Sketches.cmsHeavyFromIndex(spark, path,
        depth = 4, width = 64, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val streamed = heavy(s"$tmp/cms")
    // batch reference over the union corpus through the same index ops
    val occ = all.select(explode(split(col("text"), " ")).as("term"))
    Sketches.appendToCmsIndex(occ, col("term"), s"$tmp/cmsref", 0L,
      depth = 4, width = 64, candidates = 6)
    assert(streamed.head === heavy(s"$tmp/cmsref").head) // top hitter agrees
    assert(streamed.head._1 === "hot" && streamed.head._2 === 6L)
    // compactEvery=2 fired: cells holds the fold dir + at most the
    // batches after the fold point
    val dirs = new java.io.File(s"$tmp/cms/cells").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs.contains("batch=-1") && dirs.length <= 3, s"dirs: $dirs")

    val ms2 = MemoryStream[(Long, String, String)](spark)
    val sq2 = Streams.ingestImportanceStream(
      ms2.toDF().toDF("doc_id", "text", "lang"),
      s"$tmp/imp", s"$tmp/ck2", targetPred = col("lang") === "en",
      buckets = 128)
    ms2.addData(b0: _*); sq2.processAllAvailable()
    ms2.addData(b1: _*); sq2.processAllAvailable()
    ms2.addData(b2: _*); sq2.processAllAvailable()
    sq2.stop()
    def sel(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamedSel = sel(TextAnalysis.importanceSelectFromIndex(all,
      spark, s"$tmp/imp", "doc_id", "text", buckets = 128, n = 5))
    val adhocSel = sel(TextAnalysis.importanceSelect(all, "doc_id",
      "text", col("lang") === "en", buckets = 128, n = 5))
    assert(streamedSel === adhocSel)
    // compaction commutes with the weight read
    TextAnalysis.compactImportanceIndex(spark, s"$tmp/imp", keepLast = 0)
    assert(sel(TextAnalysis.importanceSelectFromIndex(all, spark,
      s"$tmp/imp", "doc_id", "text", buckets = 128, n = 5)) === adhocSel)
  }
}

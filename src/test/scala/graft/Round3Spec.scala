package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Relational, Similarity, TextAnalysis, Timeseries}

/** Round-3 operators: merge/upsert, gap fill + LOCF, bloom-pruned semi
  * join, fuzzy matching, tf-idf, repetition stats, int8 quantization,
  * audio windows, stream-static enrichment. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---------- mergeUpsert ----------

  test("mergeUpsert: matched rows update, unmatched source inserts, rest pass through") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val source = Seq((2L, 99.0), (4L, 44.0)).toDF("k", "bal")
    val got = Relational.mergeUpsert(target, source, "k", Seq("bal"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0),
      (4L, null, 44.0)))
  }

  test("mergeUpsert: null source value does not clobber target (coalesce keeps old)") {
    val target = Seq((1L, 10.0)).toDF("k", "bal")
    val source = Seq((1L, Option.empty[Double])).toDF("k", "bal")
    val got = Relational.mergeUpsert(target, source, "k", Seq("bal")).collect()
    assert(got.head.getDouble(1) === 10.0)
  }

  // ---------- Timeseries ----------

  test("gapFillHourlyCounts: dense hour axis, zero-filled gaps") {
    val ev = Seq(
      ("click", ts("2024-01-01 10:05:00")),
      ("click", ts("2024-01-01 13:10:00")), // 11:00 and 12:00 are gaps
      ("view", ts("2024-01-01 11:30:00")))
      .toDF("event_type", "ts")
    val got = Timeseries.gapFillHourlyCounts(ev)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(got.size === 8) // 2 types x 4 hours (10:00..13:00)
    assert(got.contains(("click", "2024-01-01 10:00:00.0", 1L)))
    assert(got.contains(("click", "2024-01-01 11:00:00.0", 0L)))
    assert(got.contains(("click", "2024-01-01 12:00:00.0", 0L)))
    assert(got.contains(("view", "2024-01-01 13:00:00.0", 0L)))
    assert(got.contains(("view", "2024-01-01 11:00:00.0", 1L)))
  }

  test("forwardFillDaily: LOCF across gap days, null before first observation") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5.0),
      (1L, ts("2024-01-03 09:00:00"), 7.0), // Jan 2 is a gap -> carries 5.0
      (2L, ts("2024-01-02 09:00:00"), 9.0)) // Jan 1 precedes first obs -> null
      .toDF("user_id", "ts", "value")
    val got = Timeseries.forwardFillDaily(ev)
      .collect().map(r => ((r.getLong(0), r.getDate(1).toString),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got((1L, "2024-01-01")) === 5.0)
    assert(got((1L, "2024-01-02")) === 5.0) // filled
    assert(got((1L, "2024-01-03")) === 7.0)
    assert(got((2L, "2024-01-01")).isNaN)   // before first obs
    assert(got((2L, "2024-01-02")) === 9.0)
    assert(got((2L, "2024-01-03")) === 9.0) // filled
  }

  // ---------- bloomSemiJoin ----------

  test("bloomSemiJoin == plain left-semi join (FPs removed by exact join)") {
    val probe = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 7).as("v"))
    val build = spark.range(0, 1000).where(col("id") % 13 === 0)
      .select(col("id").as("bk"))
    val expected = probe.join(build.select(col("bk").as("k")), Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val got = Relational.bloomSemiJoin(probe, "k", build, "bk", expectedKeys = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.size === 77)
  }

  // ---------- fuzzyPairs ----------

  test("fuzzyPairs matches brute-force levenshtein pairs (blocking loses nothing)") {
    val df = Seq("kitten", "sitten", "sittin", "sitting", "bolt", "boat",
      "a", "ab", "abcd", "zzzzzzzzzz").toDF("name")
    val maxDist = 2
    val brute = {
      val n = df.as[String].collect().distinct
      (for {
        a <- n; b <- n if a < b
        d = levenshteinRef(a, b) if d <= maxDist
      } yield (a, b, d)).toSet
    }
    val got = TextAnalysis.fuzzyPairs(df, "name", maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === brute)
    assert(got.contains(("kitten", "sitten", 1)))
    assert(got.contains(("sitten", "sitting", 2)))
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ---------- tfidf / repetition ----------

  test("tfidfTopTerms: rare terms outrank common ones; k bounds per doc") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common durian"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2)
    val byDoc = got.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(5)).map(_.getString(1)).toSeq).toMap
    // doc 1: apple tf=2 df=1 beats banana (df=2) and common (df=3)
    assert(byDoc(1L) === Seq("apple", "banana"))
    // doc 3: durian df=1 beats common (tf=2, df=3): 1e6/1 > 2*(1e6/3)
    assert(byDoc(3L) === Seq("durian", "common"))
    assert(got.groupBy("doc_id").count().collect().forall(_.getLong(1) <= 2))
  }

  test("repetitionStats: rep_ratio = max trigram count / total trigrams") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // 7 grams: "a b c" x3 is the mode
      (2L, "x y"))               // too short: no trigrams, absent
      .toDF("doc_id", "text")
    val got = Round3SpecHelper.collectRepetition(
      TextAnalysis.repetitionStats(docs, "doc_id", "text"))
    assert(got.keySet === Set(1L))
    val (nGrams, nDistinct, maxCnt, ratio) = got(1L)
    assert(nGrams === 7L)
    assert(nDistinct === 3L) // "a b c", "b c a", "c a b"
    assert(maxCnt === 3L)
    assert(ratio === 3.0 / 7.0)
  }

  test("heavyHitterTerms == exact groupBy-having result (sketch loses nothing)") {
    val docs = Q_r3.embeddings(spark).sparkSession
      .read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val exact = {
      val toks = docs.select(explode(
        graft.functions.TextFns.letterTokens(col("text"))).as("term"))
      val n = toks.count()
      val minCount = math.ceil(n * 0.01).toLong
      toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= minCount)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val got = TextAnalysis.heavyHitterTerms(docs, "doc_id", "text", 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
    assert(got.nonEmpty, "testdata word salad must have >=1% terms")
  }

  // ---------- int8 quantization ----------

  test("quantizeInt8: lanes in [-127,127], max-abs lane hits +/-127, zeros stay zero") {
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(emb, "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(got(1L) === Seq(63L, -127L, 31L)) // floor(0.5*127)=63, floor(.25*127)=31
    assert(got(2L) === Seq(0L, 0L, 0L))
    val all = got.values.flatten
    assert(all.forall(v => v >= -127L && v <= 127L))
  }

  test("quantizedTopK ranking tracks float cosine ranking closely") {
    val emb = Q_r3.embeddings(spark)
    val k = 10
    val float = Similarity.bruteForceTopK(spark, emb, "vec_id", "embedding", 0L, k)
      .collect().map(_.getLong(0)).toSet
    val quant = Similarity.quantizedTopK(emb, "vec_id", "embedding", 0L, k)
      .collect().map(_.getLong(0)).toSet
    // int8 error ~1e-2; allow 2 of 10 to differ
    assert((float intersect quant).size >= k - 2,
      s"quantized top-$k diverged: $float vs $quant")
  }

  // ---------- audio windows ----------

  test("audioWindows: window count, energy and peak match a direct computation") {
    val payload = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val media = Seq(Multimodal.MediaRow(1L, "audio", payload))
      .toDS()
    val got = Multimodal.audioWindows(media, winSize = 256, hop = 128).collect()
    assert(got.length === 1) // (300-256)/128+1 = 1
    val w = got.head
    val expected = payload.slice(0, 256).map(b => ((b & 0xFF) - 128).toLong)
    assert(w.energy === expected.map(s => s * s).sum)
    assert(w.peak === expected.map(s => math.abs(s)).max.toInt)
    // shorter than one window -> no rows
    val none = Multimodal.audioWindows(
      Seq(Multimodal.MediaRow(2L, "audio", Array.fill[Byte](100)(1))).toDS(),
      winSize = 256, hop = 128).collect()
    assert(none.isEmpty)
  }

  test("audioWindowsPcm16: little-endian int16 decode incl. negative samples") {
    // samples: 0x0100=256, 0x80FF=-32513 (sign bit), 0x7FFF=32767, 0xFFFF=-1
    val bytes = Array[Byte](0x00, 0x01, 0xFF.toByte, 0x80.toByte,
      0xFF.toByte, 0x7F, 0xFF.toByte, 0xFF.toByte,
      0x42) // trailing odd byte must be ignored
    val media = Seq(Multimodal.MediaRow(1L, "audio", bytes)).toDS()
    val got = Multimodal.audioWindowsPcm16(media, winSize = 4, hop = 4).collect()
    assert(got.length === 1)
    val samples = Seq(256L, -32513L, 32767L, -1L)
    assert(got.head.energy === samples.map(s => s * s).sum)
    assert(got.head.peak === 32767)
    // hop smaller than window: overlapping windows over 6 samples
    val six = Array[Byte](1, 0, 2, 0, 3, 0, 4, 0, 5, 0, 6, 0)
    val wins = Multimodal.audioWindowsPcm16(
      Seq(Multimodal.MediaRow(2L, "audio", six)).toDS(), winSize = 4, hop = 2)
      .collect().sortBy(_.win_idx)
    assert(wins.map(_.energy).toSeq === Seq(1L + 4 + 9 + 16, 9L + 16 + 25 + 36))
  }

  // ---------- stream-static enrichment (batch parity is the oracle's
  // job; here: the streaming path produces the same rows) ----------

  test("enrichedSegmentCounts: batch plan joins and windows correctly") {
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1.5),
      (1L, ts("2024-01-01 02:00:00"), 2.5), // same 6h window
      (2L, ts("2024-01-01 07:00:00"), 3.5)) // next window, other segment
      .toDF("user_id", "ts", "value")
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val got = graft.streaming.Streams.enrichedSegmentCounts(ev, dim)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(("BUILDING", 2L, 4000L), ("MACHINERY", 1L, 3500L)))
  }
}

/** Helpers kept outside the suite so lambdas stay serializable. */
object Round3SpecHelper {
  def collectRepetition(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Double)] =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
}

/** Embeddings loader shared with the quantization test. */
object Q_r3 {
  def embeddings(s: org.apache.spark.sql.SparkSession) =
    s.read.parquet(TestSpark.sf0001 + "/embeddings.parquet")
}

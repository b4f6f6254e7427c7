package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Behavioral pins for the exact-integer BM25 scorer: term matching,
  * idf monotonicity, length normalization, and the stored-index path's
  * bit-parity with the ad-hoc path. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def q(qs: (Long, String)*) =
    qs.toDF("query_id", "qtext")

  test("bm25TopK: all-terms doc outranks partial matches; non-matches absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // both query terms
      (2L, "alpha delta epsilon zeta"), // one query term
      (3L, "epsilon zeta eta theta"), // no query terms
      (4L, "beta gamma gamma gamma") // both, higher tf on gamma
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        q(1L -> "alpha gamma"), k = 10)
      .orderBy("rk").as[(Long, Long, Long, Long)].collect()
    val ranked = got.map(_._2)
    assert(!ranked.contains(3L), "doc without query terms must not match")
    assert(ranked.toSet === Set(1L, 2L, 4L))
    // doc 2 matches only one of the two terms -> strictly last
    assert(ranked.last === 2L, s"partial match must rank below: ${ranked.toSeq}")
    // ranks are 1..n, scores non-increasing
    assert(got.map(_._4).toSeq === (1L to got.length))
    assert(got.map(_._3).toSeq === got.map(_._3).sortBy(-_).toSeq)
  }

  test("bm25TopK: rarer term contributes more (odds idf is monotone in df)") {
    // 'rare' appears in 1 doc, 'common' in 9; both target docs have
    // identical tf and length, so score order is pure idf
    val filler = (10L to 17L).map(i => (i, "common pad pad pad"))
    val docs = (Seq(
      (1L, "rare pad pad pad"),
      (2L, "common pad pad pad")) ++ filler).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        q(1L -> "rare", 2L -> "common"), k = 1)
      .select("query_id", "score_q").as[(Long, Long)].collect().toMap
    assert(got(1L) > got(2L),
      s"rare-term hit must outscore common-term hit: $got")
  }

  test("bm25TopK: same tf, longer doc scores lower (length normalization)") {
    val docs = Seq(
      (1L, "target pad pad pad"),
      (2L, "target pad pad pad pad pad pad pad pad pad pad pad"),
      (3L, "pad other filler words")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        q(1L -> "target"), k = 10)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    assert(got(1L) > got(2L),
      s"shorter doc with equal tf must score higher: $got")
  }

  test("bm25IndexDrift: on-distribution batch reads small, shifted batch reads large; corpus not re-read") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-drift-")
      .toString
    Retrieval.writeBm25Index(docs, "doc_id", "text", s"$tmp/idx")
    def tv(batch: org.apache.spark.sql.DataFrame): Long =
      Retrieval.bm25IndexDrift(spark, s"$tmp/idx", batch, minCount = 1L)
        .agg(coalesce(sum(col("rate_diff_ppm")), lit(0L)))
        .head().getLong(0)
    val onDist = tv(Seq((100L, "the lazy dog jumps over the quick brown fox"))
      .toDF("doc_id", "text"))
    val shifted = tv(Seq((101L, "zebra quagga okapi tapir capuchin marmoset"))
      .toDF("doc_id", "text"))
    assert(onDist < 200000L, s"on-distribution drift too large: $onDist")
    assert(shifted > 1500000L, s"shifted drift too small: $shifted")
    assert(shifted > 5 * onDist)
  }

  test("bm25TopKIndexed == bm25TopK through a fresh index; memo survives re-query") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val queries = q(1L -> "hash join order", 2L -> "vector scan filter")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-").toString
    val adhoc = Retrieval.bm25TopK(docs, "doc_id", "text", queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val indexed = Retrieval.bm25TopKIndexed(spark, docs, "doc_id", "text",
        s"$tmp/idx", queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(indexed === adhoc, "stored postings path must be bit-identical")
    // second call reuses the committed index (memo + _SUCCESS)
    val again = Retrieval.bm25TopKIndexed(spark, docs, "doc_id", "text",
        s"$tmp/idx", queries, k = 10).count()
    assert(again === adhoc.size)
    assert(graft.io.IndexPaths.complete(spark, s"$tmp/idx") &&
      graft.io.IndexPaths.complete(spark, s"$tmp/idx.stats"))
  }

  test("refreshBm25IndexIfDrifted: quiet batch leaves the index alone; planted shift rebuilds to a fresh-build match") {
    val base = Seq.tabulate(20)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val shifted = Seq.tabulate(20)(i =>
      (1000L + i, "zebra quagga okapi tapir capuchin marmoset lemur"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-refresh-")
      .toString
    val idx = s"$tmp/idx"
    Retrieval.writeBm25Index(base.toDF("doc_id", "text"), "doc_id", "text",
      idx)
    val partsBefore = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    // on-distribution batch: alarm quiet, index files untouched
    val quiet = Retrieval.refreshBm25IndexIfDrifted(spark,
      sys.error("corpus must not be evaluated when the alarm is quiet"),
      "doc_id", "text", idx,
      Seq((500L, "the lazy dog jumps over the quick brown fox"))
        .toDF("doc_id", "text"), minCount = 1L)
    assert(!quiet, "on-distribution batch must not trigger a rebuild")
    assert(new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet === partsBefore,
      "quiet alarm must leave the stored index untouched")
    // shifted batch: alarm fires, rebuild over the grown corpus
    val grown = (base ++ shifted).toDF("doc_id", "text")
    val fired = Retrieval.refreshBm25IndexIfDrifted(spark, grown,
      "doc_id", "text", idx, shifted.toDF("doc_id", "text"),
      minCount = 1L)
    assert(fired, "shifted batch must trigger the rebuild")
    // the refreshed index answers exactly like a from-scratch build
    val queries = Seq((1L, "lazy dog"), (2L, "zebra okapi"))
      .toDF("query_id", "qtext")
    val viaRefreshed = Retrieval.bm25TopKIndexed(spark, grown, "doc_id",
        "text", idx, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    Retrieval.writeBm25Index(grown, "doc_id", "text", s"$tmp/fresh")
    val viaFresh = Retrieval.bm25TopKIndexed(spark, grown, "doc_id",
        "text", s"$tmp/fresh", queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaRefreshed === viaFresh,
      "alarm-triggered rebuild must equal a fresh build")
    // and the shifted vocabulary is actually served now
    assert(viaRefreshed.exists { case (qid, doc, _, _) =>
      qid == 2L && doc >= 1000L },
      "rebuilt index must rank the shifted docs for shifted queries")
  }

  test("bm25TopKLog: same ranking battery as the integer scorer; agrees on the documents queries") {
    // the three rank-determined contracts of the integer scorer hold
    // for the float log-idf form too
    val docs1 = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha delta epsilon zeta"),
      (3L, "epsilon zeta eta theta"),
      (4L, "beta gamma gamma gamma")).toDF("doc_id", "text")
    val got1 = Retrieval.bm25TopKLog(docs1, "doc_id", "text",
        q(1L -> "alpha gamma"), k = 10)
      .orderBy("rk").select("doc_id").as[Long].collect()
    assert(!got1.contains(3L) && got1.last === 2L)
    val filler = (10L to 17L).map(i => (i, "common pad pad pad"))
    val docs2 = (Seq((1L, "rare pad pad pad"),
      (2L, "common pad pad pad")) ++ filler).toDF("doc_id", "text")
    val got2 = Retrieval.bm25TopKLog(docs2, "doc_id", "text",
        q(1L -> "rare", 2L -> "common"), k = 1)
      .select("query_id", "score").as[(Long, Double)].collect().toMap
    assert(got2(1L) > got2(2L), "rare term must outscore common")
    // on the real table, top-1 per query matches the integer scorer
    // (log idf and odds idf are both monotone-decreasing in df, so
    // clear winners agree; full rankings may differ in ties)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val queries = q(1L -> "hash join order", 2L -> "vector scan filter")
    def top1(df: org.apache.spark.sql.DataFrame) =
      df.where(col("rk") === 1L).select("query_id", "doc_id")
        .as[(Long, Long)].collect().toMap
    assert(top1(Retrieval.bm25TopKLog(docs, "doc_id", "text", queries, 5))
      === top1(Retrieval.bm25TopK(docs, "doc_id", "text", queries, 5)))
  }

  test("rrfFuse: both-lists doc beats single-list; absent side scores 0; integer RRF exact") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val b = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rk")
    val got = Retrieval.rrfFuse(a, b, k = 10)
      .orderBy("rk").as[(Long, Long, Long, Long)].collect().toSeq
    // exact integer expectations: 1e9 DIV (60 + rk) — nano-scaled so
    // adjacent-rank quotients stay distinct to depth ~31623
    def s(rk: Long) = 1000000000L / (60L + rk)
    val want = Seq(
      (1L, 11L, s(2) + s(1), 1L), // in both lists: ranks 2 and 1
      (1L, 10L, s(1), 2L), // a-only rank 1
      (1L, 13L, s(2), 3L), // b-only rank 2 (s(2) < s(1))
      (1L, 12L, s(3), 4L)) // a-only rank 3
    assert(got === want, s"got $got")
  }

  test("TopKByLongScore ranks adjacent scores past 2^53 exactly (no double rounding)") {
    import org.apache.spark.sql.graft.shim
    // adjacent longs above 2^53 collapse to the SAME double, so a
    // double-keyed heap would fall back to the id tie-break and rank
    // id 1 (score big) above id 2 (score big+1) — exactly the failure
    // mode the BM25 scorer's bit-reproducibility contract forbids
    val big = 1L << 53 // 2^53+1 rounds down to 2^53 (ties-to-even)
    assert(big.toDouble == (big + 1L).toDouble,
      "precondition: the two scores are double-indistinguishable")
    val df = Seq((1L, big, 1L), (1L, big + 1L, 2L), (1L, 5L, 3L))
      .toDF("g", "score", "id")
    val agg = shim.column(graft.functions.expr.TopKByLongScore(
        shim.expression(col("score")), shim.expression(col("id")), 2)
      .toAggregateExpression())
    val got = df.groupBy(col("g")).agg(agg.as("top"))
      .select(posexplode(col("top")).as(Seq("i", "e")))
      .select(col("e.id"), col("e.score")).as[(Long, Long)]
      .collect().toSeq
    assert(got === Seq((2L, big + 1L), (1L, big)),
      s"long heap must order exactly at >2^53 magnitudes: $got")
    // and the double-keyed heap provably cannot (documents the why)
    val dagg = shim.column(graft.functions.expr.TopKByScore(
        shim.expression(col("score").cast("double")),
        shim.expression(col("id")), 2)
      .toAggregateExpression())
    val dgot = df.groupBy(col("g")).agg(dagg.as("top"))
      .select(posexplode(col("top")).as(Seq("i", "e")))
      .select(col("e.id")).as[Long].collect().toSeq
    assert(dgot === Seq(1L, 2L),
      "double heap ties on the rounded score and mis-orders — the reason the long variant exists")
  }

  test("SQL-registered top_k_by_long_score ranks a >2^53 score pair exactly (the q_sql_bm25 heap)") {
    // the SQL twin of the previous test: q_sql_bm25's SQL text ranks
    // through the registered top_k_by_long_score, so the SQL-only user
    // must get the same exact ordering at magnitudes where a
    // CAST(... AS DOUBLE) key would collapse adjacent scores
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val big = 1L << 53
    assert(big.toDouble == (big + 1L).toDouble,
      "precondition: the two scores are double-indistinguishable")
    Seq((1L, big, 1L), (1L, big + 1L, 2L), (1L, 5L, 3L))
      .toDF("g", "score", "id").createOrReplaceTempView("tklong_in")
    val got = spark.sql(
      """SELECT e.id, e.score
        |FROM (SELECT g, top_k_by_long_score(score, id, 2) AS top
        |      FROM tklong_in GROUP BY g)
        |LATERAL VIEW posexplode(top) t AS p, e
        |ORDER BY p""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, big + 1L), (1L, big)),
      s"SQL long heap must order exactly at >2^53 magnitudes: $got")
  }

  test("hybridTopKIndexed == rrfFuse over the ad-hoc sides (stored-index composition bit-identical)") {
    // the indexed composition must be a pure storage optimization:
    // bm25TopKIndexed is pinned bit-identical to bm25TopK and
    // quantizedTopKIndexedBatch to quantizedTopKBatch, so the fused
    // result must equal fusing the ad-hoc sides row for row
    import graft.operators.Similarity
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha delta epsilon zeta"),
      (3L, "epsilon zeta eta theta"),
      (4L, "beta gamma gamma alpha")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1.0f, 0.1f, 0.0f, 0.2f)),
      (2L, Seq(0.9f, 0.2f, 0.1f, 0.1f)),
      (3L, Seq(0.0f, 1.0f, 0.8f, 0.0f)),
      (4L, Seq(0.1f, 0.9f, 1.0f, 0.1f))).toDF("vec_id", "embedding")
    val queries = q(1L -> "alpha gamma", 3L -> "epsilon zeta")
    val probeIds = Seq(1L, 3L)
    val base = java.nio.file.Files.createTempDirectory("hybridx").toString
    val got = Retrieval.hybridTopKIndexed(spark,
        docs, "doc_id", "text", s"$base/bm25",
        emb, "vec_id", "embedding", s"$base/int8",
        queries, probeIds, k = 3)
      .orderBy("query_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    val adhoc = Retrieval.rrfFuse(
        Retrieval.bm25TopK(docs, "doc_id", "text", queries, 3)
          .select("query_id", "doc_id", "rk"),
        Similarity.quantizedTopKBatch(emb, "vec_id", "embedding", probeIds, 3)
          .select(col("probe_id").as("query_id"),
            col("vec_id").as("doc_id"), col("rk")),
        k = 3)
      .orderBy("query_id", "rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === adhoc, s"stored-index hybrid diverged from ad-hoc fusion:\ngot $got\nwant $adhoc")
    assert(got.nonEmpty && got.map(_._1).toSet === Set(1L, 3L))
  }

  test("q_sql_hybrid_indexed is bit-identical to the Scala indexed composition") {
    // the SQL text reads the same stored postings + int8 index the
    // Scala form reads; every stage (integer BM25, int8 dots, double
    // division, heaps, RRF) is the same arithmetic — so the rows must
    // match exactly, not approximately
    def rows(name: String) = SparkEntry.queries(name)(spark, sf)
      .orderBy("query_id", "rk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val sqlText = rows("q_sql_hybrid_indexed")
    val scala = rows("q_hybrid_retrieval_indexed")
    assert(sqlText === scala,
      s"SQL indexed hybrid diverged from the Scala composition")
    assert(sqlText.nonEmpty)
  }

  test("q_bm25_log rank oracle is safe: adjacent scores on the oracle corpus separated >> ulp") {
    // the q_bm25_log CORRECTNESS entry hashes RANKS only; that is a
    // real check iff the float ranking cannot flip under ulp-scale
    // libm ln() divergence between Spark and DuckDB. Assert, at the
    // oracle's own scale factor (sf0.01) and on the exact query set
    // the oracle replays, that every adjacent pair of ranked scores is
    // separated by a relative margin of >= 1e-9 — seven orders of
    // magnitude above double ulp (~2.2e-16 relative), so no
    // cross-engine rounding can reorder them.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val queries = graft.queries.TextQueries.bm25QuerySet
      .toDF("query_id", "qtext")
    val ranked = Retrieval.bm25TopKLog(docs, "doc_id", "text", queries, 10)
      .select(col("query_id"), col("rk"), col("score"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).values
    for (rows <- ranked) {
      val scores = rows.sortBy(_._2).map(_._3)
      for (Array(hi, lo) <- scores.sliding(2).map(_.toArray)) {
        val rel = (hi - lo) / math.max(math.abs(hi), math.abs(lo))
        assert(rel >= 1e-9,
          s"adjacent ranked scores too close for a rank-level oracle: $hi vs $lo (rel $rel)")
      }
    }
  }
}

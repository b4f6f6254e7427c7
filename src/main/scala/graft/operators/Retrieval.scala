package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Full-text retrieval over document tables: exact-INTEGER BM25
  * scoring and top-k ranking for a query set, with a stored-postings
  * index form for the production path. This is the retrieval side of a
  * training-data pipeline (decontamination lookups, retrieval-mixed
  * sampling, eval-set nearest-document audits) and the natural
  * generalization of the reference's one query — word count
  * (`/root/reference/test/wordCount.go:14-32`) — to scored search:
  * the same (term, doc, tf) relation, scored instead of summed.
  *
  * Scoring (all integer, bit-reproducible cross-engine — the full
  * DuckDB oracle replays it verbatim):
  *  - tokens: [[TextFns.letterTokens]] (the engine-wide Q6 contract);
  *    `tf` = occurrences of term in doc, `dl` = doc token count,
  *    `N` = docs with ≥ 1 token, `avgdl_floor = total_tokens DIV N`;
  *  - length ratio `r_c = (dl · 100) DIV avgdl_floor` (centi-scaled);
  *  - tf normalization with k1 = 6/5, b = 3/4 as EXACT fractions:
  *    `tfn = tf·(k1+1) / (tf + k1·(1−b+b·r))`, cross-multiplied by 20
  *    to clear denominators →
  *    `tfn_micro = (4 400 000 000 · tf) DIV (2000·tf + 600 + 18·r_c)`;
  *  - idf is the LOG-FREE probabilistic odds ratio
  *    `(N − df + ½)/(df + ½)`, cleared to integers:
  *    `idf_centi = ((2N − 2df + 1) · 100) DIV (2df + 1)` — the one
  *    deliberate departure from textbook BM25: `ln` is not
  *    correctly-rounded by IEEE (unlike sqrt), so a log idf cannot
  *    hash-match across engines; the odds form is monotone in df like
  *    the log form (rarer ⇒ larger), weights rare terms more
  *    aggressively, and is exactly replayable;
  *  - per-term contribution `(idf_centi · tfn_micro) DIV 100`, summed
  *    per (query, doc) as plain integers (order-free — no float-sum
  *    nondeterminism). Query terms are DISTINCT (bag-of-words,
  *    qtf = 1, the common BM25 practice for short queries).
  *
  * Scale shape: one word-count-shaped postings pass (map-side
  * combined), df/dl/N ride the same aggregates; query terms are a
  * BOUNDED relation (queries × terms — KBs) and BROADCAST into the
  * postings join, so the corpus never shuffles for the match; scoring
  * is row-local arithmetic; per-(query, doc) partial aggregation and
  * the per-query top-k bounded-heap ([[graft.functions.expr.TopKByScore]])
  * mean ≤ k rows per query per map task cross the wire — never a
  * query-partitioned rank window over the corpus. A hot term (present
  * in 10⁸ docs) fans out row-locally from the postings scan; its df is
  * one reducer's COUNT. */
object Retrieval {

  /** The (term, doc_id, tf, dl, df) postings relation of a corpus plus
    * its (n_docs, total_tokens) stats — df and dl DENORMALIZED onto
    * every posting row so query-time scoring is row-local. */
  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    // Deliberately NOT persisted (measured, twice): the two expensive
    // consumers of tfdl — the df rollup and the scoring join's build
    // side — sit on the SAME (term, doc_id, dl) aggregation exchange,
    // which AQE ReusedExchange dedupes at runtime, so the tokenize+
    // explode+combine runs once regardless; a cache of the raw
    // token-array table (r11's version of this comment claimed parity
    // from one favorable window) re-paid explode/aggregate per cached
    // scan and measured WORSE on the brute audit in interleaved
    // same-window A/B (min 2.69 s persisted vs 2.34 s without, ratio
    // vs the indexed sibling 1.39 -> 1.29). Same negative-persist
    // lesson as the CDC chunk relation: check for a shared exchange
    // before caching. The stats rollup does re-tokenize (no exchange
    // of its own to reuse) — a scan-speed aggregate, cheaper than the
    // cache materialization it would take to avoid it.
    val toks = docs.select(col(idCol).as("doc_id"),
        TextFns.letterTokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 1)
    val tfdl = toks
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tfdl.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("__toks")).cast("long")).as("total_tokens"))
    (tfdl.join(dfreq.hint("shuffle_hash"), Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df")),
      stats)
  }

  /** Distinct (query_id, term) rows of a query set — bounded,
    * broadcastable. */
  private def queryTerms(queries: DataFrame, qidCol: String,
      qtextCol: String): DataFrame =
    queries.select(col(qidCol).as("query_id"),
        explode(TextFns.letterTokens(col(qtextCol))).as("term"))
      .distinct()

  /** Shared scoring+ranking tail over a postings relation: broadcast
    * the query terms in, score row-locally, aggregate per (query, doc),
    * bounded-heap top-k per query. Stats arrive as a one-row frame
    * (cross-joined broadcast — same pattern as [[TextAnalysis.termDrift]]'s
    * totals). */
  private def rankPostings(postings: DataFrame, stats: DataFrame,
      qterms: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.shim
    // every division is integral DIV (never float-divide-then-floor:
    // a correctly-rounded double can land on the wrong side of an
    // integer boundary at these magnitudes)
    val scored = postings
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__rc",
        expr("(dl * 100L) DIV (total_tokens DIV n_docs)"))
      .withColumn("__tfn",
        expr("(4400000000L * tf) DIV (2000L * tf + 600L + 18L * __rc)"))
      .withColumn("__idf",
        expr("((2L * n_docs - 2L * df + 1L) * 100L) DIV (2L * df + 1L)"))
      .select(col("query_id"), col("doc_id"),
        expr("(__idf * __tfn) DIV 100L").as("__c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("score_q"))
    // long-keyed heap: the exact integer scores rank without a double
    // round-trip, whose 2^53 mantissa would round adjacent scores
    // together on huge-corpus/long-doc queries and flip tie-breaks
    val agg = shim.column(graft.functions.expr.TopKByLongScore(
        shim.expression(col("score_q")),
        shim.expression(col("doc_id")), k)
      .toAggregateExpression())
    scored.groupBy(col("query_id")).agg(agg.as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("query_id"), col("__e.id").as("doc_id"),
        col("__e.score").as("score_q"),
        (col("__p") + 1).cast("long").as("rk"))
  }

  /** BM25 top-k documents per query, computed from the corpus in one
    * pass (the ad-hoc form — production queries go through
    * [[bm25TopKIndexed]] and pay only the postings read).
    * `queries` is a (qidCol: long, qtextCol: string) relation.
    * @return (query_id, doc_id, score_q, rk) — ties broken by doc_id
    *         ascending (the bounded-heap contract), scores micro-scaled
    *         integers. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, qidCol: String = "query_id",
      qtextCol: String = "qtext"): DataFrame = {
    val (postings, stats) = postingsOf(docs, idCol, textCol)
    rankPostings(postings, stats, queryTerms(queries, qidCol, qtextCol), k)
  }

  /** Materialize the BM25 index: the denormalized postings table at
    * `path` (term, doc_id, tf, dl, df) and a one-row stats sibling at
    * `path + ".stats"` (n_docs, total_tokens). df/avgdl are
    * CORPUS-GLOBAL, so the index is rebuild-only (no append form):
    * folding a batch in without rescoring would serve stale df to
    * every query — the standard search-engine segment-merge problem;
    * rebuild on corpus change, the same offline-ingest lifecycle as
    * [[Dedup.writeContainmentIndex]]. */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
      path: String, coalesceTo: Int = 0): Unit = {
    def bounded(df: DataFrame) =
      if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    val (postings, stats) = postingsOf(docs, idCol, textCol)
    bounded(postings).write.mode("overwrite").parquet(path)
    stats.coalesce(1).write.mode("overwrite").parquet(path + ".stats")
  }

  private val bm25Indexes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Drop the build-once memo for `path` (cf.
    * [[Dedup.invalidateContainmentIndex]]). */
  def invalidateBm25Index(path: String): Unit = bm25Indexes.remove(path)

  /** BM25 top-k through the materialized index: build-once memoized
    * ([[graft.io.IndexPaths.complete]] commit markers, torn dirs
    * rebuild), then every query-set evaluation is ONE postings read +
    * the broadcast-match scoring pass — the corpus text is never
    * re-tokenized at query time. */
  /** Build-once memo around [[writeBm25Index]] (committed on-disk
    * indexes reused across JVMs, torn dirs rebuild — the
    * [[Dedup.ensureContainmentIndex]] contract). */
  def ensureBm25Index(spark: SparkSession, docs: => DataFrame,
      idCol: String, textCol: String, path: String): Unit =
    bm25Indexes.computeIfAbsent(path, { _ =>
      if (!graft.io.IndexPaths.complete(spark, path) ||
          !graft.io.IndexPaths.complete(spark, path + ".stats"))
        writeBm25Index(docs, idCol, textCol, path, coalesceTo = 8)
      java.lang.Boolean.TRUE
    })

  def bm25TopKIndexed(spark: SparkSession, docs: => DataFrame,
      idCol: String, textCol: String, path: String, queries: DataFrame,
      k: Int, qidCol: String = "query_id", qtextCol: String = "qtext")
      : DataFrame = {
    ensureBm25Index(spark, docs, idCol, textCol, path)
    rankPostings(spark.read.parquet(path),
      spark.read.parquet(path + ".stats"),
      queryTerms(queries, qidCol, qtextCol), k)
  }

  /** REBUILD ALARM for the rebuild-only index (cf.
    * [[Similarity.pqQuantizationError]] — every no-retrain index here
    * carries a one-scan staleness signal): term-distribution drift
    * between the STORED postings (term counts = Σ tf, read straight
    * off the index — the corpus is not re-tokenized) and an arriving
    * batch, as [[TextAnalysis.termDriftFromCounts]]'s exact ppm
    * relation. Sum `rate_diff_ppm` ≈ 2·10⁶ × TV distance: small for
    * on-distribution growth (df/avgdl barely move — queries stay
    * well-served), large when the corpus has shifted under the index
    * (rebuild before scores mislead). Work ∝ batch + vocabulary. */
  def bm25IndexDrift(spark: SparkSession, path: String,
      batch: DataFrame, textCol: String = "text",
      minCount: Long = 5L): DataFrame = {
    val stored = spark.read.parquet(path)
      .groupBy(col("term")).agg(sum(col("tf")).as("c_a"))
    graft.operators.TextAnalysis.termDriftFromCounts(stored, batch,
      textCol, minCount)
  }

  /** Reciprocal-rank fusion of two ranked retrieval lists — the
    * standard hybrid-retrieval combiner (lexical BM25 + dense ANN):
    * `rrf_q = Σ_sides 1 000 000 000 DIV (rrfK + rk)`, all integer
    * (nano-scaled so the classic 1/(60+r) fractions rank exactly —
    * no float sums to break cross-engine replay), absent-side
    * contribution 0. The 10⁹ scale keeps adjacent-rank quotients
    * DISTINCT until rrfK + rk ≈ √10⁹ ≈ 31 623 (quotient step < 1 only
    * past that depth) — far beyond any practical fusion list; the
    * prior 10⁶ scale degenerated ties to doc_id order from rank ~940.
    * Summed sides stay « 2⁶³ at any depth. Rank fusion needs only the RANKS, so arbitrarily
    * scaled scores from heterogeneous systems (integer BM25 micro
    * scores, double cosines) fuse without calibration — the reason
    * RRF is the default hybrid combiner in production search.
    *
    * Scale shape: both inputs are ALREADY top-k-per-query relations
    * (≤ k rows per query per side), so the full-outer join and the
    * per-query bounded heap ([[graft.functions.expr.TopKByLongScore]])
    * touch query-bounded data only — the fusion costs nothing at any
    * corpus size; the retrieval passes it fuses carry the scale story.
    * @param a,b (query_id, doc_id, rk) relations, rk 1-based
    * @return (query_id, doc_id, rrf_q, rk) — ties by doc_id asc */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
      rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.graft.shim
    def side(d: DataFrame, cn: String) =
      d.select(col("query_id"), col("doc_id"), col("rk").as(cn))
    val scored = side(a, "__rka")
      .join(side(b, "__rkb"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(expr(s"1000000000L DIV (${rrfK}L + __rka)"), lit(0L)) +
          coalesce(expr(s"1000000000L DIV (${rrfK}L + __rkb)"), lit(0L)))
          .as("rrf_q"))
    val agg = shim.column(graft.functions.expr.TopKByLongScore(
        shim.expression(col("rrf_q")),
        shim.expression(col("doc_id")), k)
      .toAggregateExpression())
    scored.groupBy(col("query_id")).agg(agg.as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("query_id"), col("__e.id").as("doc_id"),
        col("__e.score").as("rrf_q"),
        (col("__p") + 1).cast("long").as("rk"))
  }

  /** PRODUCTION hybrid retrieval — both sides through their STORED
    * indexes: lexical BM25 via the materialized postings
    * ([[bm25TopKIndexed]] — one postings read, the corpus text is
    * never re-tokenized at query time) and dense cosine via the
    * stored int8 index
    * ([[Similarity.quantizedTopKIndexedBatch]] — one scan of the
    * 8×-smaller qvec table, no per-query re-quantization), fused by
    * exact integer RRF ([[rrfFuse]]). This is the composition the
    * ad-hoc `bm25TopK × bruteForceTopKBatch` form prototypes: at
    * corpus scale the ad-hoc sides pay a full tokenize + a full float
    * scan per query set, the indexed sides pay two index scans.
    * Query ids double as dense probe vec_ids (shared id space).
    * @return (query_id, doc_id, rrf_q, rk) — [[rrfFuse]]'s contract */
  def hybridTopKIndexed(spark: SparkSession,
      docs: => DataFrame, idCol: String, textCol: String, bm25Path: String,
      emb: => DataFrame, embIdCol: String, vecCol: String, int8Path: String,
      queries: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    val text = bm25TopKIndexed(spark, docs, idCol, textCol, bm25Path,
        queries, k)
      .select(col("query_id"), col("doc_id"), col("rk"))
    val dense = graft.operators.Similarity.quantizedTopKIndexedBatch(spark,
        emb, embIdCol, vecCol, int8Path, probeIds, k)
      .select(col("probe_id").as("query_id"),
        col("vec_id").as("doc_id"), col("rk"))
    rrfFuse(text, dense, k)
  }

  /** FLOAT log-idf BM25 — the Lucene-comparable variant of [[bm25TopK]]
    * for users expecting textbook scores: idf = ln(1 + (N−df+½)/(df+½))
    * (Lucene's non-negative form), tf normalization with float
    * k1/b/avgdl. Same tokens, postings pass, broadcast query match,
    * and (score DESC, doc_id ASC) tie-break as the integer scorer —
    * only the scoring arithmetic differs. NOT oracle-hash-checkable:
    * `ln` is not correctly-rounded by IEEE, so scores can differ in
    * the last ulp across engines/libms (the documented reason the
    * flagship scorer is integer, `Retrieval` scaladoc) — rankings
    * agree with the odds-idf form on rank-determined contracts
    * (RetrievalSpec pins the behavioral battery on both). */
  def bm25TopKLog(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, qidCol: String = "query_id",
      qtextCol: String = "qtext", k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.graft.shim
    val (postings, stats) = postingsOf(docs, idCol, textCol)
    val scored = postings
      .join(broadcast(queryTerms(queries, qidCol, qtextCol)), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5))
          / (col("df").cast("double") + lit(0.5))))
      .withColumn("__tfn",
        (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("__avgdl"))))
      .select(col("query_id"), col("doc_id"),
        (col("__idf") * col("__tfn")).as("__c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("score"))
    val agg = shim.column(graft.functions.expr.TopKByScore(
        shim.expression(col("score")),
        shim.expression(col("doc_id")), k)
      .toAggregateExpression())
    scored.groupBy(col("query_id")).agg(agg.as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("query_id"), col("__e.id").as("doc_id"),
        col("__e.score").as("score"),
        (col("__p") + 1).cast("long").as("rk"))
  }

  /** ALARM → REBUILD for the rebuild-only BM25 index (cf.
    * [[graft.operators.Similarity.rebuildPqIndexIfDrifted]] — the
    * same composed arc on the most expensive rebuild here): total the
    * [[bm25IndexDrift]] ppm relation for the arriving batch against
    * the STORED postings, and iff it exceeds `maxDriftPpm`
    * (≈ 2·10⁶ × TV distance; the drift-gate default 400 000 ≙ 0.2 TV)
    * rebuild the whole index from `docs` — the CURRENT corpus, lazily
    * evaluated, untouched when the alarm stays quiet. The check costs
    * one postings-column scan + one batch tokenization (work ∝ batch
    * + vocabulary, the corpus is never re-read for the alarm); the
    * rebuilt index is identical to a fresh [[writeBm25Index]] build
    * (spec-pinned), and the build-once memo is refreshed so in-session
    * [[bm25TopKIndexed]] queries pick it up without a JVM bounce.
    * @return true iff a rebuild ran. */
  def refreshBm25IndexIfDrifted(spark: SparkSession, docs: => DataFrame,
      idCol: String, textCol: String, path: String, batch: DataFrame,
      batchTextCol: String = "text", maxDriftPpm: Long = 400000L,
      minCount: Long = 5L): Boolean = {
    val tv = bm25IndexDrift(spark, path, batch, batchTextCol, minCount)
      .agg(coalesce(sum(col("rate_diff_ppm")), lit(0L))).head().getLong(0)
    val drifted = tv > maxDriftPpm
    if (drifted) {
      writeBm25Index(docs, idCol, textCol, path, coalesceTo = 8)
      bm25Indexes.put(path, java.lang.Boolean.TRUE)
    }
    drifted
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Scale-relevant physical-plan properties, asserted (not just claimed):
  * filter/column pushdown into scans, broadcast placement, distributed
  * top-k, partial aggregation, and shuffle counts. These are the
  * properties that decide whether a plan survives 100 TB — SCALE.md
  * documents them, this spec pins them.
  */
class PlanPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter and column pruning reach the parquet scan") {
    val p = plan(SparkEntry.queries("q1_pricing_summary")(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      "filter must push into the scan")
    // 7 needed columns out of 16 — the scan must not read the rest
    assert(!p.split("ReadSchema").last.contains("l_comment"),
      "unused columns must be pruned from ReadSchema")
  }

  test("q3: dimensions broadcast; fact side is never the build side") {
    val p = plan(SparkEntry.queries("q3_top_orders")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "filtered dims must broadcast")
    assert(!p.contains("BroadcastExchange") ||
      !p.split("BroadcastExchange").last.contains("lineitem.parquet") ||
      p.indexOf("BroadcastHashJoin") >= 0)
  }

  test("q5: nation and region broadcast (multiple broadcast joins)") {
    val p = plan(SparkEntry.queries("q5_nation_revenue")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
  }

  test("q_sort_limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q_sort_limit")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort ["), "no full sort for a top-k")
  }

  test("minhash signature path: exactly one exchange (groupBy doc), no corpus distinct") {
    import graft.operators.Dedup
    val docs = Q.t(spark, sf, "documents")
    val sigs = Dedup.minhashSignaturesAgg(Dedup.rawGrams(docs, "doc_id", "text", 3), 64)
    val p = plan(sigs)
    // Q.t round-robins the single-row-group testdata (RoundRobin
    // exchange) — the only DATA shuffle allowed is the groupBy(doc_id)
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"signature path must hash-shuffle once, got plan:\n$p")
    assert(!p.contains("HashAggregate(keys=[doc_id") ||
      p.indexOf("partial_minhashsig") >= 0, "no corpus-wide distinct")
    assert(p.contains("partial_minhashsig"), "map-side partial aggregation required")
  }

  test("TopKByScore aggregates partially map-side") {
    val p = plan(SparkEntry.queries("q_topk_agg")(spark, sf))
    assert(p.contains("partial_topkbyscore"), s"partial agg missing:\n$p")
  }

  test("band join broadcasts the band table; fact side unshuffled") {
    import graft.operators.Relational
    val bands = Seq((0, 0.0, 100.0), (1, 100.0, 1e9)).toDF("band_id", "lo", "hi")
    val facts = Q.t(spark, sf, "orders").select(col("o_totalprice"))
    val p = plan(Relational.bandJoin(facts, "o_totalprice", bands))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("ShuffleExchange"), "fact side must not shuffle")
  }

  test("q1 runs inside whole-stage codegen") {
    // codegen spans appear in the AQE FINAL plan — execute first; the
    // plan string marks whole-stage-codegen stages with "*(n)" prefixes
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect()
    val p = plan(df)
    assert("""\*\(\d+\)""".r.findAllIn(p).size >= 2,
      s"both agg stages must run codegen'd:\n$p")
  }

  test("bloomSemiJoin: might_contain filter sits below the probe-side exchange") {
    import graft.operators.Relational
    val build = Q.t(spark, sf, "supplier").where(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey"))
    val probe = Q.t(spark, sf, "lineitem")
    val p = plan(Relational.bloomSemiJoin(probe, "l_suppkey", build, "s_suppkey",
      expectedKeys = 1000L))
    assert(p.contains("might_contain"), s"bloom pre-filter missing:\n$p")
    // the filter must prune BEFORE any shuffle of the probe side: in the
    // plan tree (printed top-down) the first exchange below the semi
    // join must come AFTER the might_contain filter line
    val filterIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("LeftSemi")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "bloom filter must be on the probe subtree, below the semi join")
  }

  test("gap fill: dense axis broadcasts; counts aggregate partially map-side") {
    val p = plan(SparkEntry.queries("q_gap_fill")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"dense axis must broadcast:\n$p")
    assert(p.contains("partial_count"), "per-bucket counts must combine map-side")
  }

  test("quantized top-k: no shuffle of the corpus (scan + TakeOrdered)") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.quantizedTopK(emb, "vec_id", "embedding", 0L, 10))
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
    assert(!p.contains("hashpartitioning"), "corpus must not shuffle for brute-force ANN")
  }

  test("mergeUpsert: one co-partitioned full-outer join, no extra shuffles") {
    import graft.operators.Relational
    val target = Q.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val source = Q.t(spark, sf, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice").as("c_acctbal"))
    val p = plan(Relational.mergeUpsert(target, source, "c_custkey", Seq("c_acctbal")))
    assert(p.contains("FullOuter"), s"merge must full-outer join:\n$p")
    // one exchange per side on the merge key — nothing else
    assert("Exchange hashpartitioning\\(c_custkey".r.findAllIn(p).size == 2,
      s"merge must shuffle each side exactly once, on the key:\n$p")
  }

  test("tfidf: the tf subtree is computed once (runtime exchange reuse)") {
    // hermetic: a doc-table cache left by another suite would swap the
    // scan for InMemoryTableScan and change which reuse node appears
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q_tfidf")(spark, sf)
    // the tf aggregate feeds both the score probe and the df build; the
    // initial plan prints it twice, but AQE must collapse the identical
    // exchange so the corpus is tokenized+aggregated ONCE
    df.collect()
    val p = plan(df)
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"tf subtree must be exchange-reused, not recomputed:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "n_docs scalar must broadcast, never shuffle")
  }

  test("decontaminate: eval grams broadcast; train grams never shuffle pre-join") {
    val p = plan(SparkEntry.queries("q_decontaminate")(spark, sf))
    val bhj = p.indexOf("BroadcastHashJoin")
    assert(bhj >= 0, s"eval gram set must broadcast:\n$p")
    // every doc-keyed exchange (the count-distinct phases) sits ABOVE
    // the broadcast join — i.e. over matched rows only; the sole
    // exchange BELOW the join is the tiny eval-side distinct on g
    val docEx = "Exchange hashpartitioning\\(doc_id".r
      .findAllMatchIn(p).map(_.start).toList
    assert(docEx.nonEmpty && docEx.forall(_ < bhj),
      s"train-side shuffles must be post-match only:\n$p")
    assert(!p.substring(bhj).contains("Exchange hashpartitioning(doc_id"),
      s"no corpus-wide gram shuffle below the join:\n$p")
  }

  test("cmsHeavyHitters: estimate filter prunes below the term exchange") {
    val df = SparkEntry.queries("q_cms_heavy")(spark, sf)
    val p = plan(df)
    assert(p.contains("UDF(term"), s"estimate filter missing:\n$p")
    val exIdx = p.indexOf("Exchange hashpartitioning(term")
    val fIdx = p.indexOf("UDF(term")
    // tree prints top-down: the filter must be DEEPER than the exchange
    assert(exIdx >= 0 && fIdx > exIdx,
      s"estimate filter must sit below the exact-count shuffle:\n$p")
  }

  test("candidatePairs: bounded aggregate caps buckets, no corpus sort") {
    import graft.operators.Dedup
    val docs = Q.t(spark, sf, "documents")
    val sigs = Dedup.minhashSignaturesAgg(
      Dedup.rawGrams(docs, "doc_id", "text", 3), 64)
    val p = plan(Dedup.candidatePairs(Dedup.lshBandBuckets(sigs, 16, 4),
      maxBucket = 64))
    // the cap lives in a k-bounded aggregate buffer (BottomKLongs) —
    // per-bucket state never exceeds maxBucket ids, and no reducer ever
    // materializes a hot bucket's membership
    assert(p.contains("bottom_k_longs"),
      s"bucket members must flow through the bounded aggregate:\n$p")
    // the old rank-window shape shuffled AND sorted the whole
    // bands-x-corpus bucket relation although nearly every bucket is a
    // singleton; the aggregate shape must plan NO window at all
    assert(!p.contains("row_number"),
      s"no corpus-wide rank window may remain:\n$p")
    // star edges exist only for overflow buckets (__n > cap), and that
    // tiny relation is the BUILD side of a broadcast join — the bucket
    // relation itself is never re-shuffled for the star probe
    assert("""__n#\d+L > 64""".r.findAllIn(p).nonEmpty,
      s"star build side must be filtered to overflow buckets:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"star probe must be a broadcast join:\n$p")
  }

  test("q_sql_dedup: the SQL cap caps WORK — bounded aggregate, no rank window") {
    // the pure-SQL pipeline must mirror the Scala guard's shape: the
    // round-4 form wrote the cap as a join residual `(b.r <= 64 OR
    // a.r = 1)` that Catalyst could not push below the join, so a hot
    // bucket still paid m² predicate evaluations inside one join task
    val p = plan(graft.SparkEntry.queries("q_sql_dedup")(spark, sf))
    assert(p.contains("bottom_k_longs"),
      s"SQL bucket membership must flow through the bounded aggregate:\n$p")
    assert(!p.contains("row_number"),
      s"no corpus-wide rank window may remain in the SQL form:\n$p")
    // star edges probe only overflow buckets: the kept/cnt relation is
    // filtered to cnt > 64 BEFORE joining the bands side
    assert("""cnt#\d+L? > 64""".r.findAllIn(p).nonEmpty,
      s"star join must prefilter to overflow buckets:\n$p")
  }

  test("q_source_overlap_sketch: bounded KMV aggregate — no distinct-gram shuffle, no gram self-join") {
    val p = plan(graft.SparkEntry.queries("q_source_overlap_sketch")(spark, sf))
    // raw gram hashes flow straight into the bounded sketch aggregate
    // (dedup happens in the buffer) — the exact form's corpus-wide
    // distinct + gram-keyed self-join must not appear
    assert(p.contains("bottom_k_distinct_longs"),
      s"sketch must aggregate through the bounded KMV buffer:\n$p")
    assert(!p.contains("HashAggregate(keys=[source") ||
      !p.contains("SortMergeJoin"),
      s"no gram-keyed sort-merge self-join may remain:\n$p")
    // partial aggregation: the sketch combines map-side before the
    // (only) shuffle
    assert(p.contains("ObjectHashAggregate"),
      s"KMV aggregate must run as a partial-capable object hash agg:\n$p")
  }

  test("q_window_ntile: all four window functions share one exchange") {
    val p = plan(SparkEntry.queries("q_window_ntile")(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"rank-family windows over the same spec must share a shuffle:\n$p")
  }

  test("global sort plans a sampled range exchange, never one partition") {
    val p = plan(Q.t(spark, sf, "orders").orderBy(col("o_totalprice")))
    assert(p.contains("rangepartitioning"),
      s"total order must range-partition (sampled bounds):\n$p")
    assert(!p.contains("SinglePartition"),
      "a single-partition sort dies at scale")
  }

  test("scrubFrequentSpans: no exchange ever ships text or token arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // plain scan (no test-env round-robin, which legitimately ships text);
    // AQE off so executedPlan exposes the exchanges without running
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (df, exchanges) =
      try {
        val d = graft.operators.TextAnalysis.scrubFrequentSpans(docs, "doc_id", "text")
        (d, d.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e })
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(exchanges.nonEmpty)
    for (e <- exchanges; a <- e.output)
      assert(a.name != "text" && a.name != "__toks" && a.name != "__kept",
        s"exchange must not carry corpus text, got ${e.output.map(_.name)}")
    // gram-frequency pass combines map-side
    assert(plan(df).contains("partial_count"),
      "gram counts must partially aggregate before the shuffle")
  }

  test("scoreHashedLinear plans zero exchanges (pure scan-speed map)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.operators.TextAnalysis.scoreHashedLinear(docs, "doc_id", "text")
    assert(df.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e
    }.isEmpty, "model inference must be shuffle-free")
  }

  test("containment: no rank window; candidate semi-join caps the scoring agg") {
    val p = plan(SparkEntry.queries("q_containment")(spark, sf))
    // the candidate path is aggregates + joins only — a window over the
    // gram relation would shuffle+sort the corpus (the r4 dedup-guard
    // regression shape)
    assert(!p.contains("Window"),
      s"containment must not rank-window the gram relation:\n$p")
    // the per-pair count aggregates only rows that survived the
    // broadcast candidate semi-join (pairs the prefix filter admitted)
    val semi = p.indexOf("LeftSemi")
    assert(semi >= 0, s"candidate set must semi-join the scoring rows:\n$p")
    // the scoring count's pair-keyed exchange is a PARENT of the semi
    // join (prints before it): the agg only sees semi-joined rows. The
    // candidate distinct's own pair exchange inside the broadcast build
    // side (prints after) is expected.
    val pairAgg = "Exchange hashpartitioning\\(doc_a".r
      .findAllMatchIn(p).map(_.start).toList
    assert(pairAgg.exists(_ < semi),
      s"the scoring agg must sit above the candidate semi-join:\n$p")
  }

  test("sql containment: the SQL text plans no rank window either") {
    val p = plan(SparkEntry.queries("q_sql_containment")(spark, sf))
    assert(!p.contains("Window"),
      s"the SQL form must candidate-generate through aggregates, not a rank window:\n$p")
  }

  test("vocabulary-join rule: ownership/df joins plan ShuffledHashJoin, never broadcast") {
    // the round-6 10x finding: a vocabulary-sized (gram-keyed) relation
    // must NEVER be broadcast — AQE under-estimation OOM'd the driver.
    // Pin the shuffle_hash hints' effect in the executed plans so a
    // refactor cannot silently drop them.
    // (doc-keyed covered-position/count joins in the same plans MAY
    // broadcast — those sides are genuinely small; the pin is only that
    // the gram-keyed join stays shuffled)
    for (q <- Seq("q_exact_substring", "q_gram_novelty", "q_scrub_spans")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(p.contains("ShuffledHashJoin"),
        s"$q: the gram-ownership/frequency join must be a shuffled hash join:\n$p")
    }
  }

  test("bm25: query terms broadcast into the postings scan; no rank window, no sort-merge") {
    val p = plan(SparkEntry.queries("q_bm25")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"query-term match must be a broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the BM25 path may sort-merge (corpus-side sorts):\n$p")
    assert(!p.contains("Window"),
      s"per-query top-k must be the bounded-heap aggregate, not a rank window:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "per-query top-k must be the LONG-keyed heap (exact past 2^53), partially aggregated map-side")
  }

  test("q_sql_bm25: the SQL twin also plans the bounded aggregate, no rank window") {
    val p = plan(SparkEntry.queries("q_sql_bm25")(spark, sf))
    assert(!p.contains("Window"),
      s"the SQL text's top-k must be top_k_by_long_score, not a window:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "SQL-registered LONG-keyed bounded aggregate must partially aggregate map-side (the double-keyed form rounds past 2^53)")
  }

  test("q_sql_hybrid: all three top-k passes in the SQL text are bounded heaps, no window") {
    val p = plan(SparkEntry.queries("q_sql_hybrid")(spark, sf))
    assert(!p.contains("Window"),
      s"the SQL hybrid's BM25, dense, and fusion top-k must all be registered heap aggregates:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "exact integer scores (BM25 + RRF) rank through the long heap, map-side partial")
    assert(p.contains("partial_topkbyscore"),
      "the dense cosine side ranks through the double heap, map-side partial")
  }

  test("q_hybrid_retrieval_indexed: both sides read stored indexes — no re-tokenize, no raw embedding scan") {
    val p = plan(SparkEntry.queries("q_hybrid_retrieval_indexed")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"the lexical side must read the stored postings, never re-tokenize the corpus:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"the dense side must read the stored int8 index, never re-quantize the float corpus:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "RRF fusion and both per-query top-k passes rank through long bounded heaps, map-side partial")
    assert(!p.contains("Window"),
      s"no rank windows anywhere in the hybrid composition:\n$p")
  }

  test("q_ann_hamming_indexed: shortlist scans ONLY the stored code table — never the float embeddings column") {
    val p = plan(SparkEntry.queries("q_ann_hamming_indexed")(spark, sf))
    assert(!p.contains("embeddings.parquet"),
      s"the stored-code Hamming scan must never touch the float corpus:\n$p")
    assert(!p.contains("Window"),
      s"per-probe top-k ranks through the bounded heap, not a window:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "negated-Hamming heap must partially aggregate map-side")
    // the rerank form may touch floats ONLY via the shortlist id join
    // — its shortlist subtree is this same plan (shared hammingTail)
  }

  test("q_media_redundancy_indexed: reads only the stored chunk manifest — no document payload scanned or chunked") {
    val p = plan(SparkEntry.queries("q_media_redundancy_indexed")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"the stored-manifest redundancy read must never touch the corpus:\n$p")
  }

  test("q_sql_hybrid_indexed: SQL text reads only the stored indexes; all top-k passes are heaps") {
    val p = plan(SparkEntry.queries("q_sql_hybrid_indexed")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"the SQL lexical side must read the stored postings path, never the corpus:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"the SQL dense side must read the stored int8 path, never the float corpus:\n$p")
    assert(!p.contains("Window"),
      s"no rank windows anywhere in the SQL indexed hybrid:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "BM25 + RRF rank through the registered long heap, map-side partial")
    assert(p.contains("partial_topkbyscore"),
      "the dense cosine side ranks through the double heap, map-side partial")
  }

  test("q_sql_contrastive: positives are an index read — no kNN compute, no window in the SQL plan") {
    val p = plan(SparkEntry.queries("q_sql_contrastive")(spark, sf))
    assert(!p.contains("partial_topkbyscore"),
      s"the SQL epoch turn must not recompute the kNN join (no heap aggregate):\n$p")
    assert(!p.contains("Window"),
      s"no rank windows in the SQL contrastive turn:\n$p")
  }

  test("q_training_shards: one shard-key exchange feeds the per-shard sort; scan pruned to (doc_id, text)") {
    val p = plan(SparkEntry.queries("q_training_shards")(spark, sf))
    // exactly one hash exchange on the shard key (the Q.t round-robin
    // re-split of one-row-group testdata is REPARTITION_BY_NUM, not a
    // second hash exchange)
    assert("hashpartitioning\\(shard".r.findAllIn(p).size >= 1,
      "the layout must shuffle once on the epoch-stable shard key")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"exactly one hash exchange:\n$p")
    // the rank rides the shard partitioning: a Window directly over
    // the shard sort, never a second shuffle for pos
    assert(p.contains("Window [row_number()"))
    // tokenize-at-scan: only the two needed columns are read
    assert(!p.split("ReadSchema").last.contains("source"),
      "unused columns must be pruned from the documents scan")
  }

  test("q_drop_attribution: cap is a bounded heap, no rank window anywhere") {
    val p = plan(SparkEntry.queries("q_drop_attribution")(spark, sf))
    // the per-source cap must be the k-bounded aggregate, not a
    // row_number window (which would sort whole sources on single
    // reducers at corpus scale)
    assert(p.contains("partial_topkbyscore"),
      s"domainCap must plan the bounded heap aggregate:\n$p")
    assert(!p.contains("Window"),
      s"no rank windows in the attribution plan:\n$p")
  }

  test("q_card_incremental: the card read touches no document text") {
    val p = plan(SparkEntry.queries("q_card_incremental")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"the stored-index card must not scan the corpus:\n$p")
    assert(!p.contains("Window"),
      s"the assembly is pure aggregation — no windows:\n$p")
  }

  test("q_sample_exact_n: sliver top-n, never a global sort of the corpus") {
    val p = plan(SparkEntry.queries("q_sample_exact_n")(spark, sf))
    // the exact trim is a distributed top-n over the hash-filtered
    // sliver (TakeOrderedAndProject), not a Sort + Exchange of orders
    assert(p.contains("TakeOrderedAndProject"),
      s"exact trim must plan as top-n:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      "a range-partitioned global sort anywhere is the failure mode " +
        "this operator exists to avoid")
    // the threshold filter sits below, on the scan side
    assert(p.contains("Filter") && p.contains("md5"),
      "the hash-threshold filter must appear in the plan")
  }

  test("q_sample_stratified: per-stratum picks are a bounded heap, " +
      "map-side partial — never a rank window") {
    val p = plan(SparkEntry.queries("q_sample_stratified")(spark, sf))
    assert(p.contains("partial_topkbylongscore"),
      s"stratified sampling must rank through the long heap aggregate:\n$p")
    assert(!p.contains("Window"),
      s"a window partitioned by stratum would sort whole strata on " +
        s"single reducers:\n$p")
  }

  test("q_sql_stratified: the SQL text plans the same bounded heap, no window") {
    val p = plan(SparkEntry.queries("q_sql_stratified")(spark, sf))
    assert(p.contains("partial_topkbylongscore"),
      s"the registered aggregate must appear map-side partial:\n$p")
    assert(!p.contains("Window"), s"no rank window in the SQL text:\n$p")
  }

  test("q_memorization_risk: gram counts aggregate map-side; no window, no text re-shuffle") {
    val p = plan(SparkEntry.queries("q_memorization_risk")(spark, sf))
    assert(!p.contains("Window"), s"no rank window:\n$p")
    // the count+MIN ownership pass must partially aggregate before the
    // gram exchange (a million-copy boilerplate gram is one reducer's
    // merged count, not a million shuffled rows)
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"gram ownership must combine map-side:\n$p")
  }

  test("q_memorization_incremental: the read never touches document text") {
    val p = plan(SparkEntry.queries("q_memorization_incremental")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"the stored-partials read must not rescan the corpus:\n$p")
    assert(!p.contains("Window"), s"no rank window:\n$p")
  }

  test("q_topic_mix: assignments are an index read; cuts broadcast back onto the counts") {
    val p = plan(SparkEntry.queries("q_topic_mix")(spark, sf))
    assert(!p.contains("embeddings.parquet"),
      s"topic mix must read the stored kmeans assignments, never re-cluster:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the per-cluster cut table is tiny and must broadcast:\n$p")
    assert(!p.contains("Window"), s"no rank window:\n$p")
  }

  test("q_image_neardup: codes pair through the capped bucket aggregate — no rank window; pixels never reach an exchange") {
    val p = plan(SparkEntry.queries("q_image_neardup")(spark, sf))
    assert(p.contains("bottom_k_longs"),
      s"chunk-bucket members must flow through the bounded aggregate:\n$p")
    assert(!p.contains("row_number") && !p.contains("Window"),
      s"no rank window may appear in the pair path:\n$p")
    // the decode consumes the PNG payload INSIDE the scan task: by the
    // first exchange only (doc_id, phash/chunk) survive — no exchange
    // partitions on or carries the binary content column
    val exchanges = """Exchange [^\n]*""".r.findAllIn(p).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("content")),
      s"pixel payloads must never shuffle:\n${exchanges.mkString("\n")}")
  }

  test("q_stream_ingest_cdc / q_stream_ingest_sign: the loop reads touch only the loop artifacts, never the source tables") {
    val p1 = plan(SparkEntry.queries("q_stream_ingest_cdc")(spark, sf))
    assert(!p1.contains("documents.parquet"),
      s"the audit read must not re-chunk the corpus:\n$p1")
    val p2 = plan(SparkEntry.queries("q_stream_ingest_sign")(spark, sf))
    assert(!p2.contains("embeddings.parquet"),
      s"the stored-code read must not re-pack the float corpus:\n$p2")
  }

  test("q_image_neardup_indexed / q_audio_neardup_indexed: pair search reads only the stored codes — no payload decoded or fingerprinted") {
    for (q <- Seq("q_image_neardup_indexed", "q_audio_neardup_indexed")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("documents.parquet"),
        s"$q must never touch the corpus at query time:\n$p")
      assert(!p.contains("Window"), s"$q: no rank window in the pair path")
    }
  }

  test("q_video_neardup_indexed: containment search reads only the stored frame rows — no payload framed or hashed") {
    val p = plan(SparkEntry.queries("q_video_neardup_indexed")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"q_video_neardup_indexed must never touch the corpus at query time:\n$p")
  }

  test("q_media_card: the whole card reads only the four stored artifacts — no document payload") {
    val p = plan(SparkEntry.queries("q_media_card")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"q_media_card must compose stored indexes, never re-scan the corpus:\n$p")
  }

  test("engine-wide invariant: no query plans an unbounded CartesianProduct") {
    // cross joins are legitimate only against generated/one-row axes
    // (dense time grids, corpus-size scalars) — those broadcast. A
    // CartesianProduct of two big relations anywhere in the inventory
    // is a 100 TB death sentence.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = plan(fn(spark, sf))
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(failures.isEmpty,
      s"queries planning CartesianProduct: ${failures.mkString(", ")}")
  }

  test("q_dsir_select: top-n through the long heap (no rank window); the weight table broadcasts") {
    val p = plan(SparkEntry.queries("q_dsir_select")(spark, sf))
    assert(!p.contains("Window"),
      s"DSIR's top-n must be the bounded heap, not a rank window:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "integer scores rank through the LONG heap, map-side partial")
    assert(p.contains("BroadcastHashJoin"),
      "the <= buckets-row weight table must broadcast back onto the gram stream")
  }

  test("q_cms_heavy_indexed: the stored read touches only the index, never the corpus") {
    val p = plan(SparkEntry.queries("q_cms_heavy_indexed")(spark, sf))
    assert(!p.contains("documents.parquet"),
      s"heavy hitters off the stored CMS must not rescan documents:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k over the bounded candidate set is a distributed TakeOrdered, not a global sort")
  }

  test("q_ann_hamming: per-probe top-k through the long heap, no window, no corpus sort") {
    val p = plan(SparkEntry.queries("q_ann_hamming")(spark, sf))
    assert(!p.contains("Window"),
      s"Hamming top-k must be the bounded heap:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "negated integer distances rank through the LONG heap, map-side partial")
    assert(!p.contains("SortMergeJoin"),
      "the probe side broadcasts; nothing corpus-sized sorts")
  }

  test("q_ann_hamming_rerank: both rank passes are bounded heaps; floats join by id, never full-scan per probe") {
    val p = plan(SparkEntry.queries("q_ann_hamming_rerank")(spark, sf))
    assert(!p.contains("Window"),
      s"shortlist and rerank top-k must both be heap aggregates:\n$p")
    assert(p.contains("partial_topkbylongscore"),
      "the Hamming shortlist ranks through the LONG heap")
    assert(p.contains("partial_topkbyscore"),
      "the cosine rerank ranks through the double heap")
  }

  test("q_dsir_indexed: ONE corpus gram scan (the profile rides the stored partials); ad-hoc pays two") {
    // an earlier suite's persisted documents relation would turn the
    // parquet scans into InMemoryTableScans and break the count
    spark.catalog.clearCache()
    graft.operators.Caches.release()
    val pIdx = plan(SparkEntry.queries("q_dsir_indexed")(spark, sf))
    val pAdhoc = plan(SparkEntry.queries("q_dsir_select")(spark, sf))
    def docScans(p: String) = "documents\\.parquet".r.findAllIn(p).size
    assert(docScans(pIdx) === 1,
      s"stored-profile select must scan documents exactly once:\n$pIdx")
    assert(docScans(pAdhoc) >= 2,
      "the ad-hoc form's two-scan shape is the cost the index removes")
    assert(!pIdx.contains("Window") && pIdx.contains("partial_topkbylongscore"))
  }

  test("q_sql_dsir: the SQL text plans the registered heap, no rank window") {
    val p = plan(SparkEntry.queries("q_sql_dsir")(spark, sf))
    assert(!p.contains("Window"),
      s"the SQL twin's top-n must be top_k_by_long_score:\n$p")
    assert(p.contains("partial_topkbylongscore"))
  }

  test("q_cdc_incremental: the batch chunk table is computed once (persisted, three consumers); the store enters as a parquet read") {
    spark.catalog.clearCache()
    graft.operators.Caches.release()
    val p = plan(SparkEntry.queries("q_cdc_incremental")(spark, sf))
    // the batch's chunk pipeline feeds the store probe, the novelty
    // anti-join, and the totals — all three must read the SAME cached
    // relation, not re-run the window-md5 scan
    assert(p.contains("InMemoryTableScan"),
      s"batch chunks must be persisted and shared:\n$p")
    assert(p.contains("graft_cdcidx"),
      s"the stored chunk store must appear as a parquet read:\n$p")
    graft.operators.Caches.release()
  }
}

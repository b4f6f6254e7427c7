package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sketches, TextAnalysis}

/** CMS heavy hitters + benchmark decontamination. */
class SketchTextSpec extends SparkSpec {
  import spark.implicits._

  test("cmsHeavyHitters matches brute-force exact heavy hitters") {
    val docs = Seq(
      "aa bb aa cc aa dd", "aa bb ee ff", "gg aa bb hh",
      "ii jj kk ll", "aa mm bb nn").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.cmsHeavyHitters(docs, "text", minShare = 0.15)
      .as[(String, Long)].collect().toMap
    // brute force: 22 tokens total, threshold ceil(22*0.15)=4
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val want = toks.filter(_._2 >= 4)
    assert(got === want)
    assert(got.keySet === Set("aa", "bb")) // aa:7, bb:4
  }

  test("heavy-hitter paths run two corpus actions, not three") {
    // the standalone pre-count was folded into the sketch pass (observe
    // for freqItems, combined aggregate for CMS); each path must now
    // execute exactly 2 SQL actions: sketch(+count), then exact verify
    val docs = Seq(
      "aa bb aa cc aa dd", "aa bb ee ff", "gg aa bb hh",
      "ii jj kk ll", "aa mm bb nn").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def countActions(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit = n.incrementAndGet()
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try {
        body
        // listener delivery is async — poll until the count stabilizes
        var last = -1
        var spins = 0
        while (n.get != last && spins < 50) {
          last = n.get; Thread.sleep(100); spins += 1
        }
        n.get
      } finally spark.listenerManager.unregister(l)
    }
    val cmsActions = countActions {
      TextAnalysis.cmsHeavyHitters(docs, "text", minShare = 0.15).collect()
    }
    assert(cmsActions == 2, s"CMS path must be sketch+verify, got $cmsActions actions")
    val fiActions = countActions {
      TextAnalysis.heavyHitterTerms(docs, "doc_id", "text", minShare = 0.15).collect()
    }
    assert(fiActions == 2, s"freqItems path must be sketch+verify, got $fiActions actions")
  }

  test("cmsHeavyHitters at a threshold nothing reaches is empty") {
    val docs = Seq((0L, "x y z w")).toDF("doc_id", "text")
    assert(TextAnalysis.cmsHeavyHitters(docs, "text", minShare = 0.9)
      .count() === 0L)
  }

  test("decontaminate flags exactly the train docs sharing an n-gram") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // shares 5-gram
      (2L, "completely different words here nothing shared at all"),
      (3L, "quick brown fox jumps over something else entirely"), // shares
      (4L, "short doc")).toDF("doc_id", "text") // < 5 tokens: no grams
    val eval = Seq(
      (100L, "we saw the quick brown fox jumps over a fence"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(train, eval, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    // doc 1: "the quick brown fox jumps" + "quick brown fox jumps over"
    // doc 3: "quick brown fox jumps over"
    assert(got === Map(1L -> 2L, 3L -> 1L))
  }

  test("decontaminate counts DISTINCT shared grams (repeats count once)") {
    val train = Seq((1L, "a b c d e x a b c d e")).toDF("doc_id", "text")
    val eval = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(train, eval, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L))
  }

  test("kmvDistinctGrams: estimate within KMV error of exact; small sets exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (portable <- Seq(true, false)) {
      val rows = TextAnalysis.kmvDistinctGrams(docs, "text", "source",
          m = 128, portableHash = portable)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(rows.nonEmpty)
      rows.foreach { case (src, exact, mUsed, est) =>
        if (mUsed < 128)
          assert(est == exact.toDouble,
            s"$src: sketch-resident set must report exactly (portable=$portable)")
        else
          // relative error ~1/sqrt(m) ≈ 8.8%; 30% is a >3-sigma bound
          assert(math.abs(est - exact) / exact <= 0.30,
            s"$src: est $est vs exact $exact (portable=$portable)")
      }
    }
  }

  test("HLL sketches: rollup estimates are partition-invariant and in-bounds") {
    import graft.operators.Sketches
    val base = (1 to 3000).map(i => (i % 7, (i % 450).toLong)).toDF("b", "u")
    def est(df: org.apache.spark.sql.DataFrame): Long = Sketches.hllRollup(
      Sketches.hllBuckets(df, col("b"), col("u")), lit(0))
      .select(col("est_distinct")).head().getLong(0)
    val estimates = Seq(est(base), est(base.repartition(3)),
      est(base.repartition(17, col("u"))), est(base.orderBy(col("u").desc)))
    // same input set => same unioned register state => same estimate,
    // however the input was partitioned or ordered
    assert(estimates.distinct.size === 1,
      s"union estimate must not depend on layout: $estimates")
    // and it sits within the lgK=12 sketch's error bounds of true 450
    assert(math.abs(estimates.head - 450L) <= 450L * 5 / 100,
      s"estimate ${estimates.head} too far from 450")
  }

  test("countMin: never underestimates under forced collisions; batch partials sum to the union sketch") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"w${i % 7} w${i % 3} common w${i % 11}"))
      .toDF("doc_id", "text")
    val occ = docs.select(explode(split(col("text"), " ")).as("term"))
    // width 8 << 19 distinct terms -> collisions guaranteed
    val cells = Sketches.countMinCells(occ, col("term"), depth = 3, width = 8)
    val vocab = occ.distinct()
    val est = Sketches.countMinEstimate(cells, vocab, "term",
        depth = 3, width = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val tru = occ.groupBy("term").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    tru.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS underestimated '$t': ${est(t)} < $c") }
    assert(tru.values.sum < est.values.sum,
      "width 8 over 19 terms must actually collide somewhere")
    // additivity: cell-wise sum of two batch sketches == union sketch
    val a = Sketches.countMinCells(occ.where(expr("hash(term) % 2 = 0")),
      col("term"), depth = 3, width = 8)
    val b = Sketches.countMinCells(occ.where(expr("hash(term) % 2 != 0")),
      col("term"), depth = 3, width = 8)
    val summed = a.unionByName(b).groupBy("r", "b")
      .agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val whole = cells.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(summed === whole)
  }

  test("CMS index: stored heavy-hitter read == direct computation; append replay and compaction change nothing") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, s"hot hot warm w${i % 9} w${i % 13} u$i"))
      .toDF("doc_id", "text")
    def occOf(b: Long) = docs.where(col("doc_id") % 2 === b)
      .select(explode(split(col("text"), " ")).as("term"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    (0L to 1L).foreach(b => Sketches.appendToCmsIndex(occOf(b),
      col("term"), dir, b, depth = 4, width = 64, candidates = 8))
    def read() = Sketches.cmsHeavyFromIndex(spark, dir, depth = 4,
        width = 64, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val first = read()
    assert(first.head._1 === "hot" && first(1)._1 === "warm")
    assert(first.head._2 >= 120L && first(1)._2 >= 60L,
      "estimates are upper bounds of the true counts")
    // replayed append (crash recovery) is an idempotent overwrite
    Sketches.appendToCmsIndex(occOf(1L), col("term"), dir, 1L,
      depth = 4, width = 64, candidates = 8)
    assert(read() === first)
    // compaction folds with the same associative aggregates
    Sketches.compactCmsIndex(spark, dir, keepLast = 1)
    assert(read() === first)
    // a LATER session's ensure must see the folded batch=0 as
    // complete (the batch dir is gone — its id lives in the
    // compaction manifest) — a re-run build here would double-count
    // the folded partials
    var rebuilt = false
    Sketches.ensureCmsIndex(spark, dir, Seq(0L, 1L)) { _ => rebuilt = true }
    assert(!rebuilt,
      "ensure after compaction must not re-run the build")
    assert(read() === first)
    // and fully-folded indexes (keepLast = 0) are covered too
    Sketches.compactCmsIndex(spark, dir, keepLast = 0)
    assert(read() === first)
    assert(graft.io.Compaction.foldedIds(spark, s"$dir/cells")
      === Set(0L, 1L))
    Sketches.ensureCmsIndex(spark, s"$dir", Seq(0L, 1L)) { _ => rebuilt = true }
    assert(!rebuilt && read() === first)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

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
}

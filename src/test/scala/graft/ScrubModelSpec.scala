package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Repeated-span scrub, hashed linear model inference, source overlap. */
class ScrubModelSpec extends SparkSpec {
  import spark.implicits._

  test("scrubFrequentSpans removes exactly the tokens under a repeated 5-gram") {
    // docs 0 and 1 share the 6-token prefix "a b c d e f" -> two
    // repeated 5-grams ("a b c d e", "b c d e f") covering positions
    // 0..5 in both; everything else occurs once
    val docs = Seq(
      (0L, "a b c d e f uniqA uniqB uniqC"),
      (1L, "a b c d e f otherA otherB"),
      (2L, "totally different words here no repeats at all")).toDF("doc_id", "text")
    val got = TextAnalysis.scrubFrequentSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._2 === 9 && got(0L)._4 === 6) // 6 covered tokens removed
    assert(got(1L)._2 === 8 && got(1L)._4 === 6)
    assert(got(2L)._4 === 0) // untouched
    // reconstruction commits to the kept tokens in original order
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(got(0L)._5 === m("uniqA uniqB uniqC"))
    assert(got(1L)._5 === m("otherA otherB"))
    assert(got(2L)._5 === m("totally different words here no repeats at all"))
  }

  test("scrubFrequentSpans: fully-repeated doc scrubs to the empty string") {
    val docs = Seq(
      (0L, "x y z w v"),
      (1L, "x y z w v"),
      (2L, "p q r s t u")).toDF("doc_id", "text")
    val got = TextAnalysis.scrubFrequentSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._3 === 0) // n_kept
    assert(got(0L)._5 ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex(""))
    assert(got(2L)._4 === 0)
  }

  test("dedupExactSubstrings: first doc keeps the span, later docs lose it") {
    // same planted corpus as the scrub test — but here doc 0 (the
    // FIRST occurrence) must keep its copy; only doc 1 is scrubbed
    val docs = Seq(
      (0L, "a b c d e f uniqA uniqB uniqC"),
      (1L, "a b c d e f otherA otherB"),
      (2L, "totally different words here no repeats at all")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupExactSubstrings(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(got(0L)._4 === 0) // owner untouched
    assert(got(0L)._5 === m("a b c d e f uniqA uniqB uniqC"))
    assert(got(1L)._4 === 6) // later doc loses the 6 shared tokens
    assert(got(1L)._5 === m("otherA otherB"))
    assert(got(2L)._4 === 0)
  }

  test("dedupExactSubstrings: within-doc repeats are owned, not scrubbed") {
    // doc 0 repeats its own 5-gram twice — it owns the gram, so both
    // copies survive; doc 1 quoting it loses its copy
    val docs = Seq(
      (0L, "a b c d e x a b c d e"),
      (1L, "start a b c d e end")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupExactSubstrings(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(got(0L)._4 === 0)
    assert(got(0L)._5 === m("a b c d e x a b c d e"))
    assert(got(1L)._4 === 5)
    assert(got(1L)._5 === m("start end"))
  }

  test("dedupExactSubstrings: exactly one copy of a thrice-shared span survives") {
    // letter-only tails: letterTokens drops digits, so "tail3"/"tail5"
    // would collapse into a SHARED trailing token (and a shared 5-gram)
    val docs = Seq(
      (3L, "p q r s t alpha"),
      (5L, "p q r s t beta"),
      (9L, "p q r s t gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupExactSubstrings(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(3L)._4 === 0) // min doc_id owns
    assert(got(5L)._4 === 5)
    assert(got(9L)._4 === 5)
  }

  test("scoreHashedLinear: score is the sum of md5-prefix weights per occurrence") {
    val docs = Seq((7L, "hello world hello")).toDF("doc_id", "text")
    val got = TextAnalysis.scoreHashedLinear(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, String)].head()
    def w(t: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(t).take(4), 16) - 32768L
    val want = 2 * w("hello") + w("world")
    assert(got._2 === 3 && got._3 === want)
    assert(got._4 === want.toDouble / 3.0)
    assert(got._5 === (if (got._4 >= 0) "keep" else "drop"))
  }

  test("trainHashedPerceptron: deterministic, partition-invariant; student learns the teacher") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val labels = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select(col("doc_id"),
        when(col("verdict"), lit(1L)).otherwise(lit(-1L)).as("y"))
    val w1 = TextAnalysis.trainHashedPerceptron(docs, "doc_id", "text",
      labels, dim = 512, iters = 2)
    // batch-synchronous integer updates: identical weights under any
    // partitioning — the property SGD cannot give
    val w2 = TextAnalysis.trainHashedPerceptron(docs.repartition(13),
      "doc_id", "text", labels, dim = 512, iters = 2)
    assert(w1.toSeq === w2.toSeq,
      "training must be deterministic under repartitioning")
    // the distilled student agrees with the rules teacher on a clear
    // majority of docs after two rounds (linear separability of this
    // synthetic corpus is imperfect — the floor pins learning, not
    // memorization)
    val teacher = labels.withColumnRenamed("y", "ty")
    val student = TextAnalysis.scoreHashedWeights(docs, "doc_id", "text", w1)
      .select(col("doc_id"),
        when(col("verdict") === "keep", lit(1L)).otherwise(lit(-1L)).as("sy"))
    val joined = teacher.join(student, "doc_id")
    val n = joined.count().toDouble
    val agree = joined.where(col("ty") === col("sy")).count().toDouble
    assert(agree / n >= 0.6,
      s"student must beat chance against the teacher: ${agree / n}")
  }

  test("scoreHashedWeights: broadcast path is bit-identical to the codegen-literal path") {
    // same dim (512 <= weightLiteralMaxDim) forced down both vehicles:
    // pins hashBucketJvm == hashBucket (the md5 hex-prefix arithmetic)
    // and the closure fold == the codegen aggregate
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val w = TextAnalysis.distillQualityModel(docs, "doc_id", "text",
      dim = 512, iters = 1)
    val lit = TextAnalysis.scoreHashedWeights(docs, "doc_id", "text", w)
      .orderBy("doc_id").collect().toSeq
    val bc = TextAnalysis.scoreHashedWeightsBroadcast(docs, "doc_id",
      "text", w).orderBy("doc_id").collect().toSeq
    assert(lit === bc, "literal and broadcast scoring must agree bit-for-bit")
  }

  test("dim > 4096 widens the feature hash: high buckets reachable, scoring consistent") {
    // the r9 ADVICE hazard: a 3-hex-digit md5 prefix mod dim leaves
    // buckets 4096..dim-1 permanently zero for dim > 4096. The widened
    // 12-digit prefix must populate them, and train/score must agree
    // on the same bucket map (the margin filter drives the weights, so
    // student-teacher agreement would collapse if they diverged).
    val docs = ((0L until 40L).map(i => (i,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")) ++
      (40L until 60L).map(i => (i, "bad doc here"))).toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"),
      when(col("doc_id") < 40L, lit(1L)).otherwise(lit(-1L)).as("y"))
    val w = TextAnalysis.trainHashedPerceptron(docs, "doc_id", "text",
      labels, dim = 8192, iters = 2)
    assert(w.length === 8192)
    assert(w.zipWithIndex.exists { case (v, i) => i >= 4096 && v != 0L },
      "widened hash must reach buckets beyond 4096")
    // dim > weightLiteralMaxDim scores through the broadcast closure;
    // the perfect linearly-separable teacher must be fully recovered
    val verdicts = TextAnalysis.scoreHashedWeights(docs, "doc_id", "text", w)
      .select(col("doc_id"), col("verdict")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 40L).foreach(i => assert(verdicts(i) === "keep"))
    (40L until 60L).foreach(i => assert(verdicts(i) === "drop"))
  }

  test("ingestModelStream: first batch trains; quiet batch leaves the model; planted shift retrains IN-LOOP") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    val tmp = java.nio.file.Files.createTempDirectory("graft-model-loop-")
      .toString
    val modelPath = s"$tmp/model"
    def keepDoc(id: Long) = (id,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mun")
    def dropDoc(id: Long) = (id, "bad doc here")
    val seed = (0L until 20L).map(keepDoc) ++ (20L until 30L).map(dropDoc)
    val quiet = (100L until 120L).map(keepDoc) ++ (120L until 130L).map(dropDoc)
    val shifted = (200L until 220L).map(id => (id,
      "zulu xray yankee whiskey victor uniform tango sierra romeo quebec papa oscar"))
    val ms = MemoryStream[(Long, String)](spark)
    val sq = Streams.ingestModelStream(ms.toDF().toDF("doc_id", "text"),
      modelPath, s"$tmp/corpus", s"$tmp/ckpt", dim = 128, iters = 2,
      checkDriftEvery = 1)
    // batch 0 trains and commits model + training-time term counts
    ms.addData(seed: _*); sq.processAllAvailable()
    val w0 = graft.operators.TextAnalysis.loadQualityModel(spark, modelPath)
    assert(w0.length === 128)
    assert(graft.io.IndexPaths.complete(spark,
      graft.operators.TextAnalysis.modelTrainCountsPath(modelPath)))
    assert(w0.toSeq === graft.operators.TextAnalysis.distillQualityModel(
      seed.toDF("doc_id", "text"), "doc_id", "text", dim = 128,
      iters = 2).toSeq,
      "first-batch training must equal a manual distillation over the seed")
    // batch 1: same distribution — the alarm stays quiet, model untouched
    ms.addData(quiet: _*); sq.processAllAvailable()
    assert(graft.operators.TextAnalysis.loadQualityModel(spark, modelPath)
      .toSeq === w0.toSeq,
      "an on-distribution batch must not retrain")
    // batch 2: all-new vocabulary — the term-drift alarm fires and the
    // model is re-distilled over the ACCUMULATED corpus in-loop
    ms.addData(shifted: _*); sq.processAllAvailable()
    sq.stop()
    val w2 = graft.operators.TextAnalysis.loadQualityModel(spark, modelPath)
    assert(w2.toSeq !== w0.toSeq, "the planted shift must retrain")
    val corpus = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id", "text")
    assert(w2.toSeq === graft.operators.TextAnalysis.distillQualityModel(
      corpus, "doc_id", "text", dim = 128, iters = 2).toSeq,
      "in-loop retrain must equal a manual distillation over the accumulated corpus")
  }

  test("rebuildQualityModelIfDrifted heals BOTH torn-commit variants; intact + quiet batch is a no-op") {
    import graft.operators.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft-model-heal-")
      .toString
    val modelPath = s"$tmp/model"
    val docs = ((0L until 20L).map(i => (i,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mun")) ++
      (20L until 30L).map(i => (i, "bad doc here"))).toDF("doc_id", "text")
    val quiet = docs.where(col("doc_id") < 10L)
    def success(p: String) = new java.io.File(p, "_SUCCESS")
    TextAnalysis.writeQualityModel(TextAnalysis.distillQualityModel(
      docs, "doc_id", "text", dim = 128, iters = 2), modelPath, docs)
    val w0 = TextAnalysis.loadQualityModel(spark, modelPath)
    // intact artifacts + on-distribution batch: alarm quiet, untouched
    assert(!TextAnalysis.rebuildQualityModelIfDrifted(docs, quiet,
      modelPath, dim = 128, iters = 2))
    // torn variant 1: counts sibling lost (crash between the writes)
    assert(success(TextAnalysis.modelTrainCountsPath(modelPath)).delete())
    assert(TextAnalysis.rebuildQualityModelIfDrifted(docs, quiet,
      modelPath, dim = 128, iters = 2), "missing sibling must retrain")
    assert(success(TextAnalysis.modelTrainCountsPath(modelPath)).exists())
    // torn variant 2: partial MODEL table, OLD sibling complete (crash
    // during the model overwrite) — the drift check alone would stay
    // quiet here, which is exactly why completeness gates it
    assert(success(modelPath).delete())
    assert(TextAnalysis.rebuildQualityModelIfDrifted(docs, quiet,
      modelPath, dim = 128, iters = 2), "torn model table must retrain")
    assert(success(modelPath).exists())
    assert(TextAnalysis.loadQualityModel(spark, modelPath).toSeq ===
      w0.toSeq, "healed model must equal the original commit")
  }

  test("temperatureMix: sqrt weights favor the small source vs proportional") {
    // source A: 16 docs x 4 tokens = 64 tokens; source B: 1 doc x 4
    val docs = ((0L until 16L).map(i => (i, "alpha beta gamma delta", "A")) :+
      ((99L, "epsilon zeta eta theta", "B")))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.temperatureMix(docs, "doc_id", "text", "source",
        budgetTokens = 34L)
      .collect().map(r => r.getString(0) -> r).toMap
    // w_A = floor(sqrt(64)) = 8, w_B = floor(sqrt(4)) = 2, sum = 10
    assert(got("A").getLong(3) === 8L)
    assert(got("B").getLong(3) === 2L)
    // targets: A = 34*8/10 = 27, B = 34*2/10 = 6
    assert(got("A").getLong(4) === 27L)
    assert(got("B").getLong(4) === 6L)
    // cuts: A = 27*65536/64 = 27648; B = min(65536, 6*65536/4) = 65536
    // -> B keeps EVERYTHING (its sqrt share exceeds its size) while A
    //    downsamples — sub-linear down-weighting of the big source
    assert(got("A").getLong(5) === 27648L)
    assert(got("B").getLong(5) === 65536L)
    assert(got("B").getLong(6) === 1L) // the B doc survives
  }

  test("gopherRules: each rule trips on its planted violation; clean doc passes") {
    val clean = "the quick brown fox jumps over the lazy dog again today"
    val tooShort = "just three words"
    val junkWords = "x1 2x 33 44 55 66 77 88 99 00 !! ??" // < 80% alpha
    val bullets = "- one\n- two\n- three\nplain line here with many more words today"
    val longWords = "extraordinarily incomprehensibilities internationalization " +
      "deinstitutionalization counterrevolutionaries " +
      "electroencephalographically misunderstandingly " +
      "anthropomorphologically uncharacteristically overintellectualization"
    val docs = Seq((1L, clean), (2L, tooShort), (3L, junkWords),
      (4L, bullets), (5L, longWords)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(7), "clean doc must pass")
    assert(!got(2L).getBoolean(7), "word-count rule must trip")
    assert(!got(3L).getBoolean(7), "alpha-word rule must trip")
    assert(!got(4L).getBoolean(7), "bullet-line rule must trip")
    assert(!got(5L).getBoolean(7), "mean-word-length rule must trip")
    // spot-check the integer stats for the clean doc
    assert(got(1L).getLong(1) === 11L) // words
    assert(got(1L).getLong(4) === 1L) // lines
  }

  test("termDrift: exact ppm rates and absolute difference, rare tail dropped") {
    val a = Seq((1L, "x x x x x y")).toDF("doc_id", "text") // x:5 y:1, n_a=6
    val b = Seq((2L, "x y y y y y")).toDF("doc_id", "text") // x:1 y:5, n_b=6
    val got = TextAnalysis.termDrift(a, b, "text", minCount = 5)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // y: c_a=1 < 5 but c_b=5 keeps it; both terms survive
    assert(got.keySet === Set("x", "y"))
    assert(got("x")._4 === 5000000L / 6 && got("x")._5 === 1000000L / 6)
    assert(got("x")._6 === 5000000L / 6 - 1000000L / 6)
    assert(got("y")._6 === got("x")._6) // symmetric corpus
  }

  test("vocabCoverage: top-V vocab with tie-break; per-doc oov ppm exact") {
    // counts: aa:4, bb:3, cc:2, dd:1 -> vocab(2) = {aa, bb}
    val docs = Seq(
      (1L, "aa aa bb cc"),
      (2L, "aa bb cc dd"),
      (3L, "aa bb")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 1L, 250000L))) // cc oov
    assert(got(2L) === ((2L, 4L, 2L, 500000L))) // cc, dd oov
    assert(got(3L) === ((3L, 2L, 0L, 0L)))
  }

  test("quantileDrift: interpolated deciles per group, exact diff") {
    val a = Seq(("t", 0L), ("t", 10L), ("t", 20L), ("t", 30L), ("t", 40L))
      .toDF("g", "vq")
    val b = Seq(("t", 100L), ("t", 200L)).toDF("g", "vq")
    val got = graft.operators.Timeseries
      .quantileDrift(a, b, "g", qs = Seq(0.5, 0.75))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._2 -> r).toMap
    assert(got(0.5)._3 === 20.0 && got(0.5)._4 === 150.0)
    assert(got(0.5)._5 === 130.0)
    // p75 of a: pos = 0.75*4 = 3 -> interpolated at rank 3 exactly = 30
    assert(got(0.75)._3 === 30.0 && got(0.75)._4 === 175.0)
  }

  test("sourceOverlap: exact distinct-3-gram Jaccard and containment per pair") {
    // srcA: grams {a b c, b c d}; srcB: {a b c, b c x}; srcC subset of A
    val docs = Seq(
      ("A", "a b c d"), ("A", "a b c"), // distinct grams: "a b c","b c d"
      ("B", "a b c"), ("B", "b c x"),
      ("C", "a b c")).toDF("source", "text")
    val got = TextAnalysis.sourceOverlap(docs, "text", "source")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("A", "B"))._5 === 1) // share "a b c"
    assert(got(("A", "B"))._6 === 1.0 / 3.0)
    assert(got(("A", "C"))._7 === 1.0) // C fully contained in A
    assert(got(("B", "C"))._5 === 1)
    assert(got.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
  }

  test("sourceOverlapSketch: KMV estimate tracks exact Jaccard (both hash paths)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = TextAnalysis.sourceOverlap(docs, "text", "source")
      .select("source_a", "source_b", "jaccard")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (portable <- Seq(false, true)) {
      val est = TextAnalysis.sourceOverlapSketch(docs, "text", "source",
          m = 512, portableHash = portable)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Double]("jaccard_est"), r.getAs[Long]("m_used"))).toMap
      // every exact pair is estimated (pairs with zero overlap may
      // appear on the sketch side with est 0 — allowed)
      assert(exact.keySet.subsetOf(est.keySet))
      // KMV error is ~1/sqrt(m); 0.15 is a loose >3-sigma bound at
      // m=512, and when a pair's union fits the sketch the estimate is
      // EXACT — assert that stronger property where it applies
      exact.foreach { case (k, j) =>
        val (e, mUsed) = est(k)
        assert(math.abs(e - j) <= 0.15,
          s"pair $k: estimate $e vs exact $j (portable=$portable)")
      }
      est.foreach { case (k, (e, mUsed)) =>
        if (mUsed < 512) // union fully fits: estimator degenerates to exact
          assert(math.abs(e - exact.getOrElse(k, 0.0)) < 1e-12,
            s"pair $k: full-union sketch must be exact (portable=$portable)")
      }
    }
  }
}

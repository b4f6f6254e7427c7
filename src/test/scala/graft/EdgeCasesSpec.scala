package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Relational, TextAnalysis}

/** Boundary semantics that silently break at scale if wrong: empty and
  * sub-n documents, exact gap/timestamp boundaries, oversized frames,
  * k larger than group. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("gramSets: docs shorter than n yield no shingles; exactly n yields one") {
    val df = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "one two three"),
      (5L, "...!!!"), (6L, "one two three four"))
      .toDF("doc_id", "text")
    val grams = Dedup.gramSets(df, "doc_id", "text", 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!grams.contains(1L) && !grams.contains(2L) && !grams.contains(3L))
    assert(!grams.contains(5L), "punctuation-only doc has no tokens")
    assert(grams(4L) == 1L)
    assert(grams(6L) == 2L)
  }

  test("asOfBackward: rows before any right match carry null; equal ts is visible") {
    val left = Seq((1L, ts(10), "l1"), (1L, ts(20), "l2"), (1L, ts(5), "l0"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(10), 100.0), (1L, ts(15), 150.0))
      .toDF("k", "t", "px")
    val out = Relational.asOfBackward(left, right, "k", "t",
        leftCols = Seq("tag"), carryCols = Seq("px"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("px"))).toMap
    assert(out("l0").isEmpty, "no right row at or before ts=5")
    assert(out("l1").contains(100.0), "right row at exactly left ts is visible")
    assert(out("l2").contains(150.0), "latest right row at ts<=20")
  }

  test("sessionCounts: gap exactly equal to threshold does NOT split (strict >)") {
    val ev = Seq((1L, ts(0), 1L), (1L, ts(1800), 2L), (1L, ts(3601), 3L))
      .toDF("user_id", "ts", "event_id")
    val out = Relational.sessionCounts(ev, "user_id", "ts", "event_id", 1800L)
      .head()
    assert(out.getLong(1) == 2L, "exactly-1800s gap stays, 1801s gap splits")
    assert(out.getLong(2) == 3L)
  }

  test("frameSample: frameSize beyond content yields single partial frame") {
    val media = Multimodal.mediaTable(
      Seq((1L, "short")).toDF("doc_id", "text"))
    val frames = Multimodal.frameSample(media, frameSize = 32, n = 4).collect()
    assert(frames.length == 1)
    assert(new String(frames.head.getAs[Array[Byte]]("frame")) == "short")
  }

  test("topKPerGroup: k larger than group returns whole group, ranked") {
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("g", "v")
    val out = Relational.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc), k = 5)
    assert(out.count() == 3)
    assert(out.where(col("g") === 1 && col("rk") === 1).head().getDouble(1) == 20.0)
  }

  test("bottomMSketch: doc with fewer than m grams emits all of them") {
    val df = Seq((1L, "one two three four")).toDF("doc_id", "text") // 2 grams
    val sk = TextAnalysis.bottomMSketch(df, "doc_id", "text", ngram = 3, m = 8)
    assert(sk.count() == 2)
  }

  test("wordcount tokenizer: unicode letters kept, digits and underscore split") {
    import graft.functions.TextFns
    val toks = Seq(Tuple1("héllo wörld_foo123bar über"))
      .toDF("text")
      .select(explode(TextFns.letterTokens(col("text"))).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(toks == Seq("héllo", "wörld", "foo", "bar", "über"))
  }

  test("langId: detects en/es/de/fr by stopwords, zh by Han script, und otherwise") {
    val df = Seq(
      (1L, "the cat is on the mat and it is happy"),
      (2L, "el perro que vive en la casa es de los vecinos"),
      (3L, "der Hund ist nicht mit der Katze in das Haus"),
      (4L, "le chat est dans la maison et les oiseaux"),
      (5L, "你好世界这是一个测试"),
      (6L, "xyzzy plugh qwerty"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr",
      5L -> "zh", 6L -> "und"))
  }

  test("gapFill/forwardFill: empty input yields empty output, no crash") {
    import graft.operators.Timeseries
    val empty = Seq.empty[(String, Timestamp)].toDF("event_type", "ts")
    assert(Timeseries.gapFillHourlyCounts(empty).count() === 0L)
    val emptyU = Seq.empty[(Long, Timestamp, Double)].toDF("user_id", "ts", "value")
    assert(Timeseries.forwardFillDaily(emptyU).count() === 0L)
  }

  test("mergeUpsert: empty source passes target through; empty target inserts all") {
    val target = Seq((1L, 5.0)).toDF("k", "bal")
    val empty = Seq.empty[(Long, Double)].toDF("k", "bal")
    assert(Relational.mergeUpsert(target, empty, "k", Seq("bal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet === Set((1L, 5.0)))
    assert(Relational.mergeUpsert(empty, target, "k", Seq("bal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet === Set((1L, 5.0)))
  }

  test("quantizeInt8: null vector stays null; single-element vector maps to +/-127") {
    import graft.operators.Similarity
    val df = Seq((1L, Some(Array(-0.25f))), (2L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df, "embedding").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getSeq[Long](2)))
      .toMap
    assert(got(1L) === Seq(-127L))
    assert(got(2L) === null)
  }

  test("knnJoinLsh/contrastivePairs: two-doc corpus — mutual rank-1, negatives all dropped") {
    import graft.operators.Similarity
    // identical vectors: collide in every band, each is the other's
    // only neighbor; every negative slot resolves to one of the two
    // docs (the only bucket representatives) and is dropped by the
    // anchor/positive collision rule — empty negatives, not a crash
    val emb2 = Seq(
      (1L, Seq(1.0f, 0.5f, 0.25f, 0.125f)),
      (2L, Seq(1.0f, 0.5f, 0.25f, 0.125f))).toDF("vec_id", "embedding")
    val knn = Similarity.knnJoinLsh(emb2, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(knn.toSet === Set((1L, 2L, 1L), (2L, 1L, 1L)),
      s"each doc's only neighbor is the other, at rank 1: ${knn.toSeq}")
    val trip = Similarity.contrastivePairs(emb2, "vec_id", "embedding",
      nNeg = 3, nBuckets = 64)
    assert(trip.isEmpty,
      "all negative slots collide with anchor/positive and drop — deterministically empty")
  }

  test("trainHashedPerceptron: single-class corpus converges to that class everywhere") {
    import graft.operators.TextAnalysis
    // every label +1: iteration 0 folds all docs in (margins 0), after
    // which every margin is positive — iteration 2 is a no-op and the
    // student keeps everything
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"), lit(1L).as("y"))
    val w = TextAnalysis.trainHashedPerceptron(docs, "doc_id", "text",
      labels, dim = 32, iters = 2)
    val verdicts = TextAnalysis.scoreHashedWeights(docs, "doc_id", "text", w)
      .select("verdict").as[String].collect().toSeq
    assert(verdicts === Seq("keep", "keep"),
      "an all-keep teacher must distill to an all-keep student")
  }

  test("hot-bucket guard: 1k-copy cluster yields linear pair counts, stays connected") {
    // A boilerplate page duplicated m times shares ONE MinHash signature
    // → one bucket per band; unguarded that's m(m-1)/2 pairs in a single
    // reducer. The cap bounds it at cap(cap-1)/2 + (m - cap) and the
    // representative star keeps the cluster connected.
    val m = 1000
    val cap = 8
    val docs = (0 until m)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesHashed(
      Dedup.gramHashes(docs, "doc_id", "text", 3), 64)
    val pairs = Dedup.candidatePairs(Dedup.lshBandBuckets(sigs, 16, 4),
      maxBucket = cap)
    // identical docs → all 16 bands produce the SAME capped pair set
    val expected = cap * (cap - 1) / 2 + (m - cap)
    assert(pairs.count() === expected.toLong,
      s"capped pair count must be $expected (linear), not ${m * (m - 1) / 2} (quadratic)")
    val clusters = Dedup.dedupClusters(pairs.toDF("doc_a", "doc_b"))
    assert(clusters.count() === m.toLong)
    assert(clusters.select("cluster").distinct().count() === 1L,
      "star edges must keep the dup cluster connected")
  }

  test("hot-bucket guard: simhash chunk buckets bounded the same way") {
    val m = 500
    val cap = 8
    val docs = (0 until m)
      .map(i => (i.toLong, "repeat me repeat me repeat me again and again"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"),
      maxDist = 3, bits = 64, maxBucket = Some(cap))
    assert(pairs.count() === (cap * (cap - 1) / 2 + (m - cap)).toLong)
    // opting out (maxBucket = None) restores exact pigeonhole recall:
    // every pair of the identical-doc cluster
    val exact = Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"),
      maxDist = 3, bits = 64, maxBucket = None)
    assert(exact.count() === (m.toLong * (m - 1) / 2))
  }

  test("hot-bucket guard: embedding LSH caps identical-vector floods") {
    import graft.operators.Similarity
    val m = 400
    val cap = 16
    val vec = Array.tabulate(8)(i => 0.1f * (i + 1))
    val emb = (0 until m).map(i => (i.toLong, vec)).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
      threshold = 0.9, nPlanes = 8, nBands = 8, maxBucket = cap)
    assert(pairs.count() === (cap * (cap - 1) / 2 + (m - cap)).toLong)
  }

  test("fuzzyCandidates: q-gram key prunes same-length-heavy blocks, keeps true pairs") {
    // 325 equal-length strings with pairwise-disjoint trigram sets:
    // "ababab..." patterns over distinct (c1 < c2) letter pairs (one
    // direction only — "abab…" and "baba…" are genuine edit-distance-2
    // near-dups). Band-only blocking would put all of them in one block
    // (325·324/2 ≈ 53k candidates); the composed (band, gram) key
    // yields none of those — only the planted near-duplicates meet.
    val letters = 'a' to 'z'
    val decoys = (for {
      c1 <- letters; c2 <- letters if c1 < c2
    } yield s"$c1$c2" * 10).toSeq // length 20 each
    val planted = Seq("zzzzzzzzzzzzzzzzzzzz", "zzzzzzzzzzzzzzzzzzqq") // dist 2
    val df = (decoys ++ planted).toDF("name")
    val cands = graft.operators.TextAnalysis.fuzzyCandidates(df, "name", 3)
    val n = cands.count()
    assert(n === 1L,
      s"same-length decoys must be pruned by the gram key, got $n candidates")
    assert(cands.where(col("name_a") === planted(1) && col("name_b") === planted(0))
      .count() + cands.where(col("name_a") === planted(0) && col("name_b") === planted(1))
      .count() === 1L, "the planted near-dup pair must survive blocking")
    // end-to-end: the rescored pairs are exactly the planted pair
    val pairs = graft.operators.TextAnalysis.fuzzyPairs(df, "name", 3).collect()
    assert(pairs.length == 1 && pairs.head.getAs[Int]("dist") == 2)
  }

  test("sourceBalancedMix: single source keeps everything; quotas respect budgets") {
    val one = Seq((1L, "a b c", "web"), (2L, "d e", "web")).toDF("doc_id", "text", "source")
    val r1 = TextAnalysis.sourceBalancedMix(one, "doc_id", "text", "source").head()
    assert(r1.getAs[Long]("cut_q") == 65536L && r1.getAs[Long]("n_kept") == 2L,
      "a lone source is its own minimum: full quota, all docs kept")
    // two sources, one 4x the tokens of the other: big source's quota ~ 1/4
    val docs = ((1L to 8L).map(i => (i, "w " * 20, "big")) ++
      (100L to 101L).map(i => (i, "w " * 20, "small"))).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceBalancedMix(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("small").getAs[Long]("cut_q") == 65536L)
    assert(got("big").getAs[Long]("cut_q") == 65536L / 4)
    assert(got("big").getAs[Long]("n_kept") <= got("big").getAs[Long]("n_docs"))
  }

  test("bigramLmScore: hand-computed scaled probabilities on a tiny corpus") {
    // corpus: "a b a b" and "a b"; bigrams: (a b)x3, (b a)x1; unigrams a:3, b:3
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val qAB = 3L * 1000000L / 3L // c12(a b)=3, c1(a)=3
    val qBA = 1L * 1000000L / 3L // c12(b a)=1, c1(b)=3
    assert(got(1L) == ((3L, 2 * qAB + qBA, (2 * qAB + qBA) / 3)))
    assert(got(2L) == ((1L, qAB, qAB)))
  }

  test("bloomSemiJoin: empty build side returns no rows") {
    val probe = Seq((1L, "x")).toDF("k", "v")
    val build = Seq.empty[Long].toDF("bk")
    assert(Relational.bloomSemiJoin(probe, "k", build, "bk", 10L).count() === 0L)
  }

  test("gramNovelty: first-occurrence credit by min doc_id; dup docs score zero") {
    val docs = Seq(
      (1L, "a b c d"),   // grams "a b c", "b c d" — both first here
      (2L, "a b c x"),   // "a b c" seen in 1; "b c x" novel
      (3L, "a b c d"),   // exact dup of 1 — nothing novel
      (4L, "a b"))       // too short: absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.gramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("memorizationRisk: occurrence-level singleton grams credit " +
      "their only doc; within-doc repeats are NOT unique; short docs " +
      "score zero") {
    val docs = Seq(
      (1L, "a b c d e"),     // grams: "a b c", "b c d", "c d e"
      (2L, "a b c x y"),     // "a b c" shared with 1 -> not unique
      (3L, "p q r p q r p q r"), // "p q r" x3 + others repeat WITHIN doc
      (4L, "a b"))           // too short: 0 grams, ppm 0
      .toDF("doc_id", "text")
    val got = TextAnalysis.memorizationRisk(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    // doc 1: "a b c" appears in docs 1+2 (cnt 2); "b c d", "c d e" unique
    assert(got(1L) == ((3L, 2L, 666666L)))
    // doc 2: "a b c" shared; "b c x", "c x y" unique
    assert(got(2L) == ((3L, 2L, 666666L)))
    // doc 3: 7 grams; "p q r" occurs 3x within the doc (not unique),
    // "q r p" and "r p q" occur 2x each -> ALL its grams repeat
    assert(got(3L) == ((7L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L)))
  }

  test("memorization index: fromIndex == batch operator over the " +
      "union; a later batch repeating a singleton RETROACTIVELY " +
      "clears the earlier doc's risk; re-append is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("memidx").toString
    val b0 = Seq((1L, "a b c d e"), (2L, "p q r s t")).toDF("doc_id", "text")
    // batch 1 repeats doc 1's "a b c" — doc 1's risk must DROP at read
    val b1 = Seq((10L, "a b c z z")).toDF("doc_id", "text")
    TextAnalysis.appendToMemorizationIndex(b0, "doc_id", "text", dir, 0L, n = 3)
    val after0 = TextAnalysis.memorizationFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(after0(1L) == 1000000L && after0(2L) == 1000000L)
    TextAnalysis.appendToMemorizationIndex(b1, "doc_id", "text", dir, 1L, n = 3)
    val after1 = TextAnalysis.memorizationFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // retroactive: "a b c" now occurs twice corpus-wide
    assert(after1(1L) == ((3L, 2L, 666666L)))
    assert(after1(2L) == ((3L, 3L, 1000000L)))
    // doc 10: "a b c" dup; "b c z" unique; "c z z" unique
    assert(after1(10L) == ((3L, 2L, 666666L)))
    // equivalence with the batch operator over the union
    val batch = TextAnalysis.memorizationRisk(b0.unionByName(b1),
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(batch === after1)
    // crashed-append replay: overwriting batch 1 changes nothing
    TextAnalysis.appendToMemorizationIndex(b1, "doc_id", "text", dir, 1L, n = 3)
    val again = TextAnalysis.memorizationFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again === after1)
  }

  test("packBalanced: round-robin-decreasing deal; bins per shard = " +
      "ceil(tokens/budget); every doc lands exactly once") {
    // one shard (ids 0..99): sizes 10,8,6,4,2 tokens -> 30 tokens,
    // budget 10 -> 3 bins; rank-dealt: bin0={10,4}, bin1={8,2}, bin2={6}
    val docs = Seq(
      (0L, Seq.fill(10)("w").mkString(" ")),
      (1L, Seq.fill(8)("w").mkString(" ")),
      (2L, Seq.fill(6)("w").mkString(" ")),
      (3L, Seq.fill(4)("w").mkString(" ")),
      (4L, Seq.fill(2)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packBalanced(docs, "doc_id", "text",
        budget = 10, docsPerShard = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (0L, 2L)))
    assert(got((0L, 0L)) == ((2L, 14L, 1400000L)))
    assert(got((0L, 1L)) == ((2L, 10L, 1000000L)))
    assert(got((0L, 2L)) == ((1L, 6L, 600000L)))
    // imbalance bound: max bin <= min bin + largest doc
    val fills = got.values.map(_._2)
    assert(fills.max <= fills.min + 10L)
  }

  test("fertilityAdjustedMix: cost = words*fert DIV 100 per language; " +
      "sqrt cuts run over cost masses; unknown lang costs neutral 100") {
    val en = (1L to 8L).map(i => (i, "w " * 50 + s"x$i", "en"))
    val de = (100L to 103L).map(i => (i, "w " * 50 + s"x$i", "de"))
    val docs = (en ++ de).toDF("doc_id", "text", "lang")
    val fert = Map("en" -> 100L, "de" -> 200L)
    val got = TextAnalysis.fertilityAdjustedMix(docs, "doc_id", "text",
      col("lang"), budgetBpeTokens = 2000L, fertCpw = fert)
    val rows = got.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // every doc has 51 words; en cost 51, de cost (51*200) DIV 100 = 102
    assert(rows(1L)._1 == "en" && rows(1L)._2 == 51L && rows(1L)._3 == 51L)
    assert(rows(100L)._1 == "de" && rows(100L)._3 == 102L)
    // replay the cuts: masses en 8*51=408, de 4*102=408 -> w_q 20 each,
    // target 2000*20 DIV 40 = 1000 per lang;
    // cut en = min(65536, 1000*65536 DIV 408), de same mass
    val cutEn = math.min(65536L, 1000L * 65536L / 408L)
    assert(rows(1L)._4 == cutEn && rows(100L)._4 == cutEn)
    // neutral fertility for an unmapped language
    val und = Seq((999L, "zzz qqq www", "xx")).toDF("doc_id", "text", "lang")
    val u = TextAnalysis.fertilityAdjustedMix(und, "doc_id", "text",
      col("lang"), budgetBpeTokens = 10L, fertCpw = fert).collect().head
    assert(u.getString(1) == "xx" && u.getLong(3) == u.getLong(2))
  }

  test("domainCap: at most cap docs per source, picked in md5-of-id order") {
    val docs = ((1L to 5L).map(i => (i, s"t$i", "big")) ++
      (100L to 101L).map(i => (i, s"t$i", "small")))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.domainCap(docs, "doc_id", "source", cap = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent selection replay: 48-bit md5 prefix, id tie-break
    def pfx(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val wantBig = (1L to 5L).sortBy(i => (pfx(i), i)).take(3).toSet
    assert(got.count(_._2 == "big") == 3)
    assert(got.filter(_._2 == "big").map(_._1).toSet == wantBig)
    // the small source is under the cap: everything kept, ranks dense
    assert(got.filter(_._2 == "small").map(_._1).toSet == Set(100L, 101L))
    assert(got.filter(_._2 == "small").map(_._3).sorted.toSeq == Seq(1L, 2L))
  }

  test("dedupExactSubstrings: sub-n docs have no grams and pass through intact") {
    val docs = Seq((1L, "one two"), (2L, "one two"),
      (3L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupExactSubstrings(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // identical 2-token docs share no 5-gram — nothing to scrub
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("leakageSafeSplit: empty pair list degenerates to plain splitAssign") {
    val docs = (1L to 40L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Dedup.leakageSafeSplit(docs, none, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val plain = Relational.splitAssign(docs, col("doc_id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === plain)
  }

  test("temperatureMix: single source caps at its own size, never oversamples") {
    val docs = (0L until 8L).map(i => (i, "alpha beta gamma delta", "solo"))
      .toDF("doc_id", "text", "source")
    // budget far above corpus: cut clamps at 65536 -> everything kept
    val got = TextAnalysis.temperatureMix(docs, "doc_id", "text", "source",
      budgetTokens = 1000000L).collect().head
    assert(got.getLong(5) === 65536L)
    assert(got.getLong(6) === 8L)
  }

  test("gopherRules: empty text scores zeros and fails the word-count rule") {
    val got = TextAnalysis.gopherRules(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(got.getLong(1) === 0L && got.getLong(2) === 0L)
    assert(!got.getBoolean(7))
  }

  test("ingest loops: an empty batch is a no-op (no dirs, no index writes)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-batch")
      .toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.ingestContainmentBatch(empty, 0L, s"$tmp/cidx", s"$tmp/cadm")
    TextAnalysis.ingestSubstringScrubBatch(empty, 0L, s"$tmp/sidx",
      s"$tmp/sadm")
    TextAnalysis.driftGatedIngestBatch(empty, 0L,
      Seq((1L, "ref words here")).toDF("doc_id", "text"),
      s"$tmp/gadm", s"$tmp/gq")
    TextAnalysis.writeReferenceCounts(
      Seq((1L, "ref words here")).toDF("doc_id", "text"), s"$tmp/refc")
    TextAnalysis.driftGatedIngestBatchStored(empty, 0L, s"$tmp/refc",
      s"$tmp/sgadm", s"$tmp/sgq")
    Dedup.gatedIngestDedupBatch(empty, 0L, s"$tmp/refc", s"$tmp/ggq",
      s"$tmp/ggidx", s"$tmp/ggadm")
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (d <- Seq("cidx", "cadm", "sidx", "sadm", "gadm", "gq",
        "sgadm", "sgq", "ggq", "ggidx", "ggadm"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/$d")),
        s"empty batch must not create $d")
  }

  test("bm25TopK edge cases: letterless query matches nothing; empty corpus yields no rows; partition-invariant") {
    import graft.operators.Retrieval
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "gamma delta epsilon")).toDF("doc_id", "text")
    // a query with no letter tokens produces no terms -> no rows
    assert(Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq((1L, "12345 !!!")).toDF("query_id", "qtext"), 10).count() === 0L)
    // empty corpus -> no rows (and no divide-by-zero in avgdl)
    assert(Retrieval.bm25TopK(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      Seq((1L, "alpha")).toDF("query_id", "qtext"), 10).count() === 0L)
    // integer scoring is partition-invariant: 1 vs 7 partitions agree
    val q = Seq((1L, "beta gamma")).toDF("query_id", "qtext")
    def rows(d: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(d, "doc_id", "text", q, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(rows(docs.repartition(1)) === rows(docs.repartition(7)))
  }

  test("temperatureMixDocs: a zero-token source keeps cut_q = 65536 (no divide-by-zero)") {
    val counts = Seq((1L, "a", 10L), (2L, "a", 6L), (3L, "b", 0L))
      .toDF("doc_id", "source", "n_tok")
    val got = TextAnalysis.temperatureMixDocs(counts, budgetTokens = 8L)
      .select("doc_id", "cut_q", "kept")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got(3L)._1 === 65536L && got(3L)._2,
      s"zero-token source must keep everything: $got")
    assert(got(1L)._1 < 65536L, "non-empty source must be cut under budget")
  }

  test("trainingShards edge cases: nShards=1 is a pure permutation; empty corpus is empty, not a crash") {
    val docs = Seq((1L, "a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    val one = TextAnalysis.trainingShards(docs, "doc_id", "text",
        nShards = 1, epoch = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // everything in shard 0, pos a permutation of 1..3
    assert(one.forall(_._2 === 0L))
    assert(one.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
    val empty = TextAnalysis.trainingShards(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      nShards = 4)
    assert(empty.count() === 0L)
    assert(TextAnalysis.shardManifest(empty).count() === 0L)
  }

  test("card/calibration indexes: empty and letterless batches fold cleanly; reads stay well-defined") {
    val path = java.nio.file.Files.createTempDirectory("graft_edge_card")
      .toString + "/card"
    val calPath = java.nio.file.Files.createTempDirectory("graft_edge_cal")
      .toString + "/hist"
    // a batch whose docs have NO letter tokens: the card counts them
    // (n_tok 0, dup rule still applies); the calibration histogram
    // excludes them (no score — the calibratedQualityKeep contract)
    val weird = Seq((1L, "123 456", "web"), (2L, "!!!", "web"))
      .toDF("doc_id", "text", "source")
    TextAnalysis.appendToCardIndex(weird, "doc_id", "text", "source",
      path, 0L)
    TextAnalysis.appendToCalibrationIndex(weird, "doc_id", "text",
      "source", calPath, 0L)
    val card = TextAnalysis.cardFromIndex(spark, path)
      .select("source", "n_docs", "n_tokens", "dup_ppm")
      .as[(String, Long, Long, Long)].collect()
    assert(card.toSeq === Seq(("web", 2L, 0L, 0L)))
    // scoreless batch -> empty histogram -> empty threshold table (no
    // crash, no phantom source row)
    assert(TextAnalysis.calibrationThresholds(spark, calPath, 32768L)
      .count() === 0L)
    // an EMPTY batch folds as empty partials and changes nothing
    TextAnalysis.appendToCardIndex(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", path, 1L)
    val again = TextAnalysis.cardFromIndex(spark, path)
      .select("source", "n_docs", "n_tokens", "dup_ppm")
      .as[(String, Long, Long, Long)].collect()
    assert(again.toSeq === Seq(("web", 2L, 0L, 0L)))
  }

  test("dropAttribution: a corpus where every doc fails the rules is all-'gopher', never empty") {
    val docs = Seq((1L, "too short", "a"), (2L, "also short", "b"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.dropAttribution(docs, "doc_id", "text",
        "source", minWords = 25)
      .select("doc_id", "stage").as[(Long, String)].collect().toMap
    try assert(got === Map(1L -> "gopher", 2L -> "gopher"))
    finally graft.operators.Caches.release()
  }

  test("softDedupKeep: empty pair list degenerates to keep-everything at the default weight") {
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.softDedupKeep(docs, pairs, "doc_id")
      .select("doc_id", "cl_size", "weight_q", "kept")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 1L, 65536L, true), (2L, 1L, 65536L, true)))
  }

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
}

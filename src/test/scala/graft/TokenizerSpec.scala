package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Pins the reference's tokenizer semantics (SURVEY §1.4-Q6): split on
  * non-\p{L}, case-sensitive, Unicode letters kept, digits/punct are
  * separators. Ref: /root/reference/test/wordCount.go:16-19.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("text").select(TextFns.letterTokens(col("text")).as("t"))
      .head().getSeq[String](0)

  test("splits on non-letters, drops empties") {
    assert(toks("the quick,brown fox!") === Seq("the", "quick", "brown", "fox"))
    assert(toks("  leading and trailing  ") === Seq("leading", "and", "trailing"))
    assert(toks("") === Seq())
    assert(toks("123 456 !!!") === Seq())
  }

  test("case-sensitive (reference counts 'The' and 'the' separately)") {
    val df = Seq("The the THE").toDF("text")
      .select(explode(TextFns.letterTokens(col("text"))).as("w"))
      .groupBy("w").count()
    assert(df.count() === 3)
  }

  test("digits and punctuation are separators, not letters") {
    assert(toks("word1word") === Seq("word", "word"))
    assert(toks("a-b_c.d") === Seq("a", "b", "c", "d"))
  }

  test("unicode letters are kept (\\p{L} == Go unicode.IsLetter)") {
    assert(toks("café 中文 naïve Ω") === Seq("café", "中文", "naïve", "Ω"))
    // CJK is one token per run (no non-letter between them)
    assert(toks("中文字") === Seq("中文字"))
  }

  test("golden word count on the fixture corpus") {
    val corpus = "The fox. The FOX! the fox; café café 42 中文"
    val got = Seq(corpus).toDF("text")
      .select(explode(TextFns.letterTokens(col("text"))).as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "The" -> 2, "FOX" -> 1, "the" -> 1, "fox" -> 2, "café" -> 2, "中文" -> 1))
  }

  test("wordNGrams: consecutive grams, short docs yield empty") {
    val g3 = Seq("a b c d").toDF("text")
      .select(TextFns.wordNGrams(TextFns.letterTokens(col("text")), 3).as("g"))
      .head().getSeq[String](0)
    assert(g3 === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextFns.wordNGrams(TextFns.letterTokens(col("text")), 3).as("g"))
      .head().getSeq[String](0)
    assert(short === Seq())
  }

  test("BPE: greedy lowest-rank merges produce known counts on fixed strings") {
    import graft.functions.Bpe
    // toy table: rank 0 = (t,h), rank 1 = (th,e), rank 2 = (a,t)
    val rank = Bpe.ranks(Seq(("t", "h"), ("th", "e"), ("a", "t")))
    assert(Bpe.encodeCount("the", rank) == 1)   // t h e → th e → the
    assert(Bpe.encodeCount("that", rank) == 2)  // t h a t → th a t → th at
    assert(Bpe.encodeCount("x", rank) == 1)
    assert(Bpe.encodeCount("", rank) == 0)
    assert(Bpe.encodeCount("zzz", rank) == 3)   // no merges apply
    // lowest rank wins when several pairs are present: in "athe",
    // (t,h) rank 0 beats (a,t) rank 2 → a th e → a the → 2 tokens
    assert(Bpe.encodeCount("athe", rank) == 2)
  }

  test("BPE: default-table dataframe counts respect bounds and memoized batching") {
    import graft.functions.Bpe
    val docs = Seq((1L, "the cat and the hat"), (2L, ""), (3L, "zzz qqq"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCountsBpe(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // "the" → 1 token under the default table; 5 words, 15 non-ws chars
    val (bpe1, ws1, ch1) = got(1L)
    assert(ws1 == 5 && ch1 == 15 && bpe1 >= ws1 && bpe1 < ch1)
    assert(got(2L) == ((0L, 0L, 0L)))
    val (bpe3, ws3, ch3) = got(3L)
    assert(ws3 == 2 && ch3 == 6 && bpe3 == 6, "no default merge applies to zzz/qqq")
  }

  test("BPE: merges.txt parser — header/comment skip, round-trip, malformed rejected") {
    import graft.functions.Bpe
    val txt = "#version: 0.2\n# provenance comment\nt h\nth e\n\na t\n"
    val parsed = Bpe.parseMerges(txt.linesIterator)
    assert(parsed == Seq(("t", "h"), ("th", "e"), ("a", "t")))
    // format → parse round-trips, header included
    assert(Bpe.parseMerges(Bpe.formatMerges(parsed).linesIterator) == parsed)
    // a '#'-initial line AFTER data starts is a merge, not a comment —
    // markdown-heavy corpora genuinely learn ("#","#")
    val withHash = Seq(("t", "h"), ("#", "#"), ("##", "#"))
    assert(Bpe.parseMerges(Bpe.formatMerges(withHash).linesIterator) == withHash)
    intercept[IllegalArgumentException] {
      Bpe.parseMerges(Iterator("a b c"))
    }
    intercept[IllegalArgumentException] {
      Bpe.parseMerges(Iterator("nospace"))
    }
  }

  test("BPE: trainer learns the classic corpus's merges in frequency order") {
    import graft.functions.Bpe
    // Sennrich et al.'s worked example shape. Hand-computed pair
    // frequencies: round 1 has (e,s)=9 tied with (s,t)=9 — the
    // deterministic tie-break (count desc, then pair asc) picks (e,s);
    // merging es leaves (es,t)=9 the unique max; then (l,o)=7 ties
    // (o,w)=7 → (l,o); merging lo leaves (lo,w)=7.
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainFromWordCounts(counts, numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"learned prefix must match the hand-computed sequence, got $merges")
    // under that table: n e w e s t → n e w es t → n e w est = 4 tokens
    assert(Bpe.encodeCount("newest", Bpe.ranks(merges)) == 4)
    // determinism: retraining yields the identical table
    assert(Bpe.trainFromWordCounts(counts, numMerges = 4) == merges)
  }

  test("BPE: bounded vocabulary collect — junk-tail corpus yields identical merges") {
    import graft.functions.Bpe
    // a clean high-frequency core (300 copies — every core pair count
    // >= 300) plus a 3000-word junk tail of unique count-1 strings over
    // an alphabet DISJOINT from the core's letters: junk pair mass
    // (max ~70 on 256 possible pairs) can neither boost a core pair
    // nor outrank one within 10 merges, so the top-maxVocab cut drops
    // exactly the tail and the learned merges must not move. (With a
    // shared alphabet the tail legitimately shifts boundary merges —
    // that is the documented truncation caveat, not a bug.)
    val core = "the then there other another mother rather brother weather"
    val junkAlpha = "cdfgijklpquvxyz"
    val rng = new scala.util.Random(7)
    val junk = (0 until 3000).map { _ =>
      (0 until 5).map(_ => junkAlpha(rng.nextInt(junkAlpha.length))).mkString
    }.distinct
    val docs = ((0 until 300).map(i => (i.toLong, core)) ++
      junk.zipWithIndex.map { case (w, i) => ((1000 + i).toLong, w) })
      .toDF("doc_id", "text")
    val coreDistinct = core.split(" ").distinct.length
    val bounded = Bpe.train(docs, "text", numMerges = 10,
      maxVocab = coreDistinct)
    val unbounded = Bpe.train(docs, "text", numMerges = 10,
      maxVocab = Int.MaxValue)
    assert(bounded == unbounded,
      s"bounded collect must not change the learned merges:\n$bounded\nvs\n$unbounded")
    // and the bound actually bit: the tail is far larger than the cut
    assert(junk.size > coreDistinct * 100)
  }

  test("BPE: vendored learned table — size, format, exact counts on known strings") {
    import graft.functions.Bpe
    val merges = Bpe.vendoredMerges
    assert(merges.size == 3000, s"vendored table must carry 3000 ranks, got ${merges.size}")
    // the table must start from character-pair merges (a learned table
    // ranks the most frequent digraphs first; multi-char symbols can
    // only appear after their parts merged)
    assert(merges.take(4).forall { case (a, b) => a.length == 1 && b.length == 1 })
    val rank = Bpe.ranks(merges)
    // golden counts pinned against the committed table: corpus-frequent
    // words collapse to one token; unseen words split into learned
    // subwords; alphabet noise stays character-level
    assert(Bpe.encodeCount("the", rank) == 1)
    assert(Bpe.encodeCount("license", rank) == 1)
    assert(Bpe.encodeCount("copyright", rank) == 1)
    assert(Bpe.encodeCount("relicensed", rank) == 2)  // re + licensed
    assert(Bpe.encodeCount("sparkly", rank) == 2)     // spark + ly
    assert(Bpe.encodeCount("tokenizer", rank) == 4)   // to + ken + iz + er
    assert(Bpe.encodeCount("xyzzyq", rank) == 6)      // no merges apply
    // dataframe path under the vendored table keeps the bound contract
    val docs = Seq((1L, "the license is sparkly"), (2L, "xyzzyq"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCountsBpe(docs, "doc_id", "text", merges = merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((5L, 4L, 19L))) // 1+1+1+2 tokens, 4 words, 19 chars
    assert(got(2L) == ((6L, 1L, 6L)))
  }

  test("tokenizerFertility: exact per-language values against a direct encode; one scan, no join") {
    import graft.functions.Bpe
    import graft.operators.TextAnalysis
    val en = Seq("the cat and the dog sat on the mat",
      "she said that it was not for him")
    val es = Seq("el perro y el gato de la casa son bonitos")
    val docs = (en ++ es).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.tokenizerFertility(docs, "doc_id", "text",
        merges = Bpe.vendoredMerges)
      .select("pred_lang", "n_docs", "n_ws_tokens", "fert_cpw", "fert_ok")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val rank = Bpe.ranks(Bpe.vendoredMerges)
    def expect(texts: Seq[String]): (Long, Long) = {
      val words = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      val bpe = words.map(w => Bpe.encodeCount(w, rank).toLong).sum
      (words.length.toLong, bpe * 100L / words.length)
    }
    val (enWs, enFert) = expect(en)
    val (esWs, esFert) = expect(es)
    assert(got.keySet === Set("en", "es"))
    assert(got("en") === (("en", 2L, enWs, enFert, true)))
    assert(got("es") === (("es", 1L, esWs, esFert, true)))
    // scale stance: the lang tag rides the encode scan — no corpus-
    // keyed join (and no exchange at all before the rollup's own)
    val plan = TextAnalysis.tokenizerFertility(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"fertility must not join:\n$plan")
  }
}

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
}

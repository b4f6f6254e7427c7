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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure Catalyst
  * expression compositions — per-row, embarrassingly parallel, no
  * shuffle at all, so they run at scan speed on any corpus size.
  */
object TextAnalysis {

  /** Tiny per-language stopword tables for the n-gram/stopword heuristic
    * language identifier. Deliberately small and deterministic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "un", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "dans", "que"))

  /** Stopword-hit score for one language over lower-cased letter tokens. */
  def langScore(textCol: Column, lang: String): Column =
    TextFns.countIn(TextFns.lowerTokens(textCol), stopwords(lang))

  /** Language-ID: Han-script ratio decides zh (no spaces, stopwords
    * useless there); otherwise argmax of per-language stopword scores
    * with a fixed priority tie-break (en > es > de > fr), 'und' when
    * nothing matched. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val (en, es, de, fr) =
      (langScore(t, "en"), langScore(t, "es"), langScore(t, "de"), langScore(t, "fr"))
    // Java regex script class; the DuckDB oracle mirrors with RE2's \p{Han}
    val han = length(regexp_replace(t, "[^\\p{IsHan}]", ""))
    docs.select(col(idCol).as("doc_id"),
      en.as("score_en"), es.as("score_es"), de.as("score_de"), fr.as("score_fr"),
      han.cast("long").as("han_chars"),
      when(han * 5 > length(t), lit("zh"))
        .when(en + es + de + fr === 0, lit("und"))
        .when(en >= es && en >= de && en >= fr, lit("en"))
        .when(es >= de && es >= fr, lit("es"))
        .when(de >= fr, lit("de"))
        .otherwise(lit("fr")).as("pred_lang"))
  }

  /** Heuristic quality metrics: token count, char length, letter ratio,
    * stopword ratio, and a coarse keep/drop verdict. All ratios are
    * exact integer divisions cast to double (bit-stable cross-engine). */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = size(TextFns.wsTokens(t))
    val nChar = length(t)
    val nLetter = length(regexp_replace(t, "[^\\p{L}]", ""))
    val nStop = TextFns.countIn(TextFns.lowerTokens(t), stopwords("en"))
    docs.select(col(idCol).as("doc_id"),
      nTok.as("n_tokens"), nChar.as("char_len"),
      (nLetter.cast("double") / nChar.cast("double")).as("letter_ratio"),
      (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"))
      .withColumn("verdict",
        when(col("n_tokens") >= 5 && col("letter_ratio") >= 0.5, lit("keep"))
          .otherwise(lit("drop")))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * (alnum runs). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol).as("doc_id"),
      size(TextFns.wsTokens(t)).as("ws_tokens"),
      size(filter(split(t, "[^A-Za-z0-9]+"), x => length(x) > 0)).as("alnum_tokens"),
      length(t).as("char_len"))
  }

  /** Content fingerprint: md5 of the canonical normalization, first 16
    * hex chars. Identical duplicates (post-normalization) collide. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      substring(md5(TextFns.normalized(col(textCol))), 1, 16).as("fp"))

  /** Bottom-m document sketch (winnowing-style): the m lexicographically
    * smallest md5 hashes of the doc's distinct word n-grams. Sketch
    * overlap estimates n-gram Jaccard (bottom-m is a uniform sample of
    * the gram universe); two near-dup docs share most fingerprints.
    * One shuffle (rank per doc via window); sketch size is bounded so
    * downstream pair-matching joins carry m rows per doc, not the full
    * gram set. */
  def bottomMSketch(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, m: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Dedup.gramSets(docs, idCol, textCol, ngram)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("fp_hash").asc)
    grams.select(col("doc_id"), md5(col("g")).as("fp_hash"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= m)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("fp_hash"))
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the GPT-2-style greedy merge
  * algorithm (Sennrich et al. 2016 subword BPE as used by the GPT-2
  * tokenizer): a word starts as its character sequence, then the
  * adjacent pair with the LOWEST merge rank is merged, repeatedly,
  * until no pair in the word has a rank. Token count per word = final
  * symbol count. Pure JVM, no model download — the merges table is
  * vendored (a small hand-ranked English table below, or supply your
  * own learned table).
  *
  * Corpus budgeting (packing, chunking) in a real pipeline is done in
  * model-tokenizer tokens; the regex approximation in
  * [[graft.operators.TextAnalysis.tokenCounts]] miscounts subword
  * splits — this path counts them exactly for whatever merge table the
  * model uses.
  */
object Bpe {

  /** Small vendored merge table: common English digraph/suffix merges,
    * rank = position (lower merges first). A real deployment would drop
    * in the model's learned merges file; the ALGORITHM is identical. */
  val defaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("e", "r"), ("an", "d"), ("o", "u"), ("e", "n"),
    ("in", "g"), ("o", "r"), ("a", "t"), ("e", "s"), ("s", "t"),
    ("a", "r"), ("o", "f"), ("t", "o"), ("i", "t"), ("i", "s"),
    ("e", "d"), ("a", "l"), ("l", "e"), ("s", "e"), ("c", "o"),
    ("d", "e"), ("h", "a"), ("h", "e"), ("l", "l"), ("m", "e"),
    ("n", "o"), ("p", "e"), ("r", "a"), ("r", "i"), ("r", "o"),
    ("t", "i"), ("u", "s"), ("w", "a"), ("w", "e"), ("l", "y"),
    ("ou", "r"), ("er", "s"), ("th", "at"), ("ing", "s"))

  /** Rank lookup keyed by the two symbols to merge. */
  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** BPE token count of ONE word: greedy lowest-rank-first merging over
    * the word's symbol sequence. O(len²) worst case on the symbol
    * array — words are short, and callers memoize per distinct word. */
  def encodeCount(word: String, rank: Map[(String, String), Int]): Int = {
    if (word.isEmpty) return 0
    var symbols = word.map(_.toString).toBuffer
    var done = false
    while (!done && symbols.length > 1) {
      // find the present pair with the lowest rank
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < symbols.length - 1) {
        val r = rank.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of that pair (left to right)
        val (l, r) = (symbols(best), symbols(best + 1))
        val merged = l + r
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < symbols.length) {
          if (j < symbols.length - 1 && symbols(j) == l && symbols(j + 1) == r) {
            out += merged; j += 2
          } else { out += symbols(j); j += 1 }
        }
        symbols = out
      }
    }
    symbols.length
  }

  /** Per-document BPE token counts over whitespace-pre-tokenized text:
    * (doc_id, bpe_tokens, ws_tokens, char_tokens) where char_tokens is
    * the character-level count (sum of word lengths) — the no-merges
    * upper bound, so ws_tokens <= bpe_tokens <= char_tokens always
    * holds and (char_tokens - bpe_tokens) measures realized merging.
    * Runs partition-batched with a per-partition memo over distinct
    * words — Zipf makes the cache hit rate high, so the per-word
    * O(len²) merge loop runs once per VOCABULARY entry per partition,
    * not once per token. No shuffle; scan-speed like the other per-row
    * text operators. */
  def tokenCountsBpe(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = defaultMerges): DataFrame = {
    import docs.sparkSession.implicits._
    val rank = ranks(merges)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (docId, text) =>
          val words = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
          var total = 0L
          var chars = 0L
          words.foreach { w =>
            total += memo.getOrElseUpdate(w, encodeCount(w, rank))
            chars += w.length
          }
          (docId, total, words.length.toLong, chars)
        }
      }
      .toDF("doc_id", "bpe_tokens", "ws_tokens", "char_tokens")
  }
}

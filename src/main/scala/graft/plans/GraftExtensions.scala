package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{BottomKDistinctLongs, BottomKLongs, DotProductD, DotProductQ, MinHashSig, MinHashSigLong, SimHashAgg, TopKByLongScore, TopKByScore}

/** Engine extension point: registers the native expressions with the
  * Catalyst function registry so they are callable from SQL text, not
  * just the Column API.
  *
  * Activate per-session with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`; on an
  * ALREADY-BUILT session call [[GraftExtensions.ensureRegistered]]
  * (native expressions) and [[GraftExtensions.installSqlMacros]]
  * (catalog SQL functions for the LLM-pipeline operators).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProductQ].getName, null, name, usage, "")

  /** The native-expression SQL surface (shared by the extension
    * injection and [[ensureRegistered]]). */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_q",
      info("dot_q", "dot_q(a, b) - fixed-point (x1000 floored) dot product of two float arrays, exact cross-engine"),
      (children: Seq[Expression]) => DotProductQ(children(0), children(1))),
    ("dot_d",
      info("dot_d", "dot_d(a, b) - double dot product of two float arrays (strict left-to-right fold)"),
      (children: Seq[Expression]) => DotProductD(children(0), children(1))),
    ("top_k_by_score",
      info("top_k_by_score",
        "top_k_by_score(score, id, k) - bounded top-k aggregate: array<struct<score,id>> ranked by (score DESC, id ASC)"),
      (children: Seq[Expression]) => TopKByScore(children(0), children(1),
        children(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("top_k_by_long_score",
      info("top_k_by_long_score",
        "top_k_by_long_score(score, id, k) - bounded top-k aggregate over LONG scores: array<struct<score,id>> ranked by (score DESC, id ASC); exact past 2^53 where the double-keyed form rounds adjacent scores together"),
      (children: Seq[Expression]) => TopKByLongScore(children(0), children(1),
        children(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("minhash_sig",
      info("minhash_sig",
        "minhash_sig(gram, n) - n-view MinHash signature aggregate over a string column (array<bigint>)"),
      (children: Seq[Expression]) => MinHashSig(children(0),
        children(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("simhash_agg",
      info("simhash_agg",
        "simhash_agg(token) - 64-bit SimHash signature aggregate over a token column"),
      (children: Seq[Expression]) => SimHashAgg(children(0))
        .toAggregateExpression()),
    ("minhash_sig_long",
      info("minhash_sig_long",
        "minhash_sig_long(gram_hash, n) - n-view MinHash signature aggregate over pre-hashed (bigint) grams (array<bigint>); the string-free production signature path"),
      (children: Seq[Expression]) => MinHashSigLong(children(0),
        children(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("bottom_k_longs",
      info("bottom_k_longs",
        "bottom_k_longs(id, k) - bounded aggregate: the k smallest ids per group as a sorted array; the hot-bucket guard's buffer"),
      (children: Seq[Expression]) => BottomKLongs(children(0),
        children(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("bottom_k_distinct",
      info("bottom_k_distinct",
        "bottom_k_distinct(h, k) - KMV sketch aggregate: the k smallest DISTINCT longs per group as a sorted array; feed raw hash streams, no upstream distinct needed"),
      (children: Seq[Expression]) => BottomKDistinctLongs(children(0),
        children(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()))

  /** Register the native expressions on a live session (idempotent —
    * re-registration overwrites with identical builders). This is the
    * path for users who did not set `spark.sql.extensions`. */
  def ensureRegistered(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graft.shim.registerFunction(spark, name, i, builder)
    }

  /** Install the LLM-pipeline operators as catalog SQL functions
    * (temporary, session-scoped) so a SQL-only user can run the
    * curation surface without writing Scala — the engine's analogue of
    * the reference's submit-a-program client
    * (`/root/reference/mpClient/client.go:15-43`). All are pure SQL
    * macros: they inline into the caller's plan and stay inside
    * whole-stage codegen. */
  def installSqlMacros(spark: SparkSession): Unit = {
    // letter tokens (the reference tokenizer: split on non-letters,
    // Q6 semantics) — array<string>
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_tokens(t STRING)
        |RETURNS ARRAY<STRING>
        |RETURN filter(split(t, '[^\\p{L}]+'), x -> x <> '')""".stripMargin)
    // quality verdict (mirrors TextAnalysis.quality)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_quality_keep(t STRING)
        |RETURNS BOOLEAN
        |RETURN size(filter(split(t, '\\s+'), x -> x <> '')) >= 5
        |  AND CAST(length(regexp_replace(t, '[^\\p{L}]', '')) AS DOUBLE)
        |      / length(t) >= 0.5""".stripMargin)
    // distinct word n-gram shingles over a PRE-MATERIALIZED token array
    // (mirrors Dedup.gramSets row shape). The parameter is referenced
    // several times, but callers pass a materialized array column, so
    // each reference is an attribute read, not a re-tokenization.
    // (the body re-binds `ws` to the lambda variable `a` before any
    // nested lambda touches it: Spark 4.1's SQL-UDF analysis mis-binds
    // an ARRAY parameter referenced inside a nested lambda as a free
    // lambda variable — MISSING_ATTRIBUTES at creation)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_grams_arr(
        |  ws ARRAY<STRING>, n INT)
        |RETURNS ARRAY<STRING>
        |RETURN flatten(transform(array(ws),
        |  a -> CASE WHEN size(a) >= n
        |    THEN array_distinct(transform(
        |      sequence(1, size(a) - n + 1),
        |      i -> concat_ws(' ', slice(a, i, n))))
        |    ELSE array() END))""".stripMargin)
    // string form: tokenize ONCE. SQL-macro inlining substitutes
    // arguments textually, so a body that wrote `graft_tokens(t)` at
    // each of its three use sites would re-run split+filter per gram
    // position — the O(words²)-per-doc hazard Dedup.rawGrams documents
    // (measured 85× the CPU on the Scala side). The one-element
    // `transform` is SQL's let-binding: the lambda variable `ws` binds
    // the token array exactly once per row. (The body repeats
    // graft_grams_arr's logic rather than calling it: UDF inlining
    // wraps arguments in a Project, and a lambda variable cannot cross
    // that boundary — MISSING_ATTRIBUTES at analysis.)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_grams(t STRING, n INT)
        |RETURNS ARRAY<STRING>
        |RETURN flatten(transform(array(graft_tokens(t)),
        |  ws -> CASE WHEN size(ws) >= n
        |    THEN array_distinct(transform(
        |      sequence(1, size(ws) - n + 1),
        |      i -> concat_ws(' ', slice(ws, i, n))))
        |    ELSE array() END))""".stripMargin)
    // hashed-linear classifier score (mirrors
    // TextAnalysis.scoreHashedLinear: md5-prefix weight per token
    // occurrence, summed) — the SQL surface of model-based filtering
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_model_score(t STRING)
        |RETURNS BIGINT
        |RETURN aggregate(graft_tokens(t), 0L,
        |  (acc, w) -> acc + CAST(conv(substring(md5(w), 1, 4), 16, 10)
        |    AS BIGINT) - 32768L)""".stripMargin)
    // benchmark decontamination (mirrors TextAnalysis.decontaminate's
    // verdict): shared distinct n-grams between a training doc and the
    // eval suite's gram set. The eval side of a decontamination run is
    // fixed-size (a benchmark, not a corpus), so the SQL user passes it
    // as an array — `(SELECT collect_set(g) FROM eval_grams)` — which
    // Catalyst evaluates once as a scalar subquery and ships like the
    // Scala operator's broadcast; the corpus side stays one scan.
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_shared_grams(
        |  t STRING, eval_grams ARRAY<STRING>, n INT)
        |RETURNS INT
        |RETURN size(array_intersect(graft_grams(t, n), eval_grams))""".stripMargin)
    // term-drift arithmetic (mirrors TextAnalysis.termDrift): exact
    // integer parts-per-million rate and absolute rate difference, so a
    // SQL drift query is just word counts + these two macros
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_rate_ppm(
        |  cnt BIGINT, total BIGINT)
        |RETURNS BIGINT
        |RETURN (cnt * 1000000L) DIV total""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_rate_diff_ppm(
        |  c_a BIGINT, n_a BIGINT, c_b BIGINT, n_b BIGINT)
        |RETURNS BIGINT
        |RETURN abs(graft_rate_ppm(c_a, n_a) - graft_rate_ppm(c_b, n_b))""".stripMargin)
    // RAG chunk bounds (mirrors TextAnalysis.chunkDocs arithmetic):
    // table function usable in LATERAL position
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_chunk_bounds(
        |  n_tokens BIGINT, chunk INT, stride INT)
        |RETURNS TABLE(chunk_idx BIGINT, start_tok BIGINT, n_tok BIGINT)
        |RETURN SELECT
        |  idx AS chunk_idx,
        |  idx * stride AS start_tok,
        |  least(CAST(chunk AS BIGINT), n_tokens - idx * stride) AS n_tok
        |FROM (SELECT explode(sequence(0L,
        |  CASE WHEN n_tokens <= chunk THEN 0L
        |       ELSE (n_tokens - chunk + stride - 1) DIV stride END)) AS idx)
        |WHERE n_tokens > 0""".stripMargin)
  }
}

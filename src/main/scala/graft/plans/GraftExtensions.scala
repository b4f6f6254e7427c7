package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{DotProductD, DotProductQ, MinHashSig, SimHashAgg, TopKByScore}

/** Engine extension point: registers the native expressions with the
  * Catalyst function registry so they are callable from SQL text, not
  * just the Column API.
  *
  * Activate per-session with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProductQ].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_q"),
      info("dot_q", "dot_q(a, b) - fixed-point (x1000 floored) dot product of two float arrays, exact cross-engine"),
      (children: Seq[Expression]) => DotProductQ(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      info("dot_d", "dot_d(a, b) - double dot product of two float arrays (strict left-to-right fold)"),
      (children: Seq[Expression]) => DotProductD(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score",
        "top_k_by_score(score, id, k) - bounded top-k aggregate: array<struct<score,id>> ranked by (score DESC, id ASC)"),
      (children: Seq[Expression]) => TopKByScore(children(0), children(1),
        children(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(gram, n) - n-view MinHash signature aggregate over a string column (array<bigint>)"),
      (children: Seq[Expression]) => MinHashSig(children(0),
        children(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("simhash_agg"),
      info("simhash_agg",
        "simhash_agg(token) - 64-bit SimHash signature aggregate over a token column"),
      (children: Seq[Expression]) => SimHashAgg(children(0))
        .toAggregateExpression()))
  }
}

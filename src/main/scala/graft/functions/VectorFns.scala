package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns. Two tiers:
  *
  *  - `cosine` / `dot`: plain double arithmetic via `zip_with` +
  *    `aggregate` — a strict left-to-right fold, fully codegen'd.
  *  - `cosineQ`: fixed-point (×1000, floored) variant whose arithmetic is
  *    exact integer math, so the result double is **bit-identical across
  *    engines** regardless of summation order — used wherever results
  *    must hash-match an external oracle.
  */
object VectorFns {

  import org.apache.spark.sql.graft.{shim => ExpressionUtils}
  import graft.functions.expr.{DotProductD, DotProductQ}

  /** Native fused-loop dot product (custom Catalyst Expression with
    * doGenCode — no intermediate product array, primitive arithmetic). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductD(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** Composable-functions form kept for reference/fallback: identical
    * result (strict left-to-right fold), ~2× slower, used by tests to
    * cross-check the native expression. */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** floor(x*1000) as long — the fixed-point quantizer. floor (not cast)
    * because SQL engines disagree on double→int cast rounding, but IEEE
    * floor is exact everywhere. */
  def qint(x: Column): Column = floor(x.cast("double") * lit(1000.0)).cast("long")

  def dotQ(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductQ(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** Composable form of [[dotQ]] (cross-check in tests). */
  def dotQComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => qint(x) * qint(y)), lit(0L), (acc, v) => acc + v)

  /** Deterministic cross-engine cosine: integer dot / sqrt of integer
    * norms. For 64-dim unit-ish floats the intermediate products stay
    * far below Long overflow (|q|<~5e3 → dot <~1.6e9, na*nb <~2.6e18). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") / sqrt((dotQ(a, a) * dotQ(b, b)).cast("double"))

  /** Exact integer dot product of two array<bigint> columns (already-
    * quantized vectors — no further scaling). */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
}

package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native fused dot products over `array<float>` embeddings.
  *
  * The composable form (`aggregate(zip_with(a, b, ...), ...)`) is
  * codegen'd but materializes the element-wise product array per row;
  * these expressions generate a single fused loop — no intermediate
  * allocation, primitive arithmetic only — which is the hot inner loop
  * of every similarity/ANN/near-dup operator at corpus scale.
  *
  * Both are null-strict: null input array, any null element, or a
  * length mismatch between the two arrays yields null (matching the
  * zip_with/aggregate composition they replace — zip_with pads the
  * shorter array with nulls, which nulls the fold).
  */

/** floor(x*1000) fixed-point dot product (bit-exact cross-engine — see
  * [[graft.functions.VectorFns.dotQ]]). */
case class DotProductQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  // a null ELEMENT nulls the result even when both array inputs are
  // non-null, so nullability cannot be inherited from the children
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += math.floor(x.getFloat(i).toDouble * 1000.0).toLong *
        math.floor(y.getFloat(i).toDouble * 1000.0).toLong
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |long $acc = 0L;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (long) Math.floor((double) $x.getFloat($i) * 1000.0)
         |        * (long) Math.floor((double) $y.getFloat($i) * 1000.0);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)
}

/** Plain double dot product (strict left-to-right fold, same order as
  * the aggregate() composition). */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

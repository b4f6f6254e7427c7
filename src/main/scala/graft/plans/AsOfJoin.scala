package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native backward as-of join (SURVEY §2 Part B: the one relational
  * operator Spark lacks as a first-class node), the full custom-operator
  * stack: LogicalPlan node → Strategy → physical sort-merge operator.
  *
  * Semantics match [[graft.operators.Relational.asOfBackward]]: for each
  * left row, attach the carried columns of the LATEST right row with the
  * same key and right.ts <= left.ts (a right row at exactly left.ts is
  * visible); no match → nulls. Keys must be integral (long) and ts a
  * timestamp/long — both compare as long.
  *
  * Scale behavior: children are hash-clustered on the key and sorted by
  * (key, ts) — the same requirements as a sort-merge join, so Spark
  * plans ONE shuffle per side (or zero if the data is already
  * co-partitioned, e.g. bucketed tables) and the merge itself is a
  * single forward pass per partition holding ONE buffered right row —
  * O(1) memory, no window buffering, no row explosion.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    carried: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lts, rk, rts, carried) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, carried) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    carried: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true))

  // same contract as SortMergeJoin: co-cluster on the key...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // ...and sort within partitions by (key, ts)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val carriedLocal = carried
    val (lk, lt, rk, rt) = (leftKey, leftTs, rightKey, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyP = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rKeyP = UnsafeProjection.create(Seq(rk, rt), rOut)
      val carryP = UnsafeProjection.create(carriedLocal, rOut)
      val nullCarry = new GenericInternalRow(carriedLocal.length)
      val joined = new JoinedRow

      var rRow: InternalRow = null          // lookahead right row
      var rK = 0L; var rT = 0L; var rValid = false
      var lastKey = 0L
      var lastCarry: InternalRow = null     // copied projection of best match
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIt.hasNext) {
          rRow = rIt.next()
          val kt = rKeyP(rRow)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rK = kt.getLong(0); rT = kt.getLong(1); rValid = true
          }
        }
        if (!rValid) rRow = null
      }
      advanceRight()

      lIt.map { lRow =>
        val kt = lKeyP(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          joined(lRow, nullCarry)
        } else {
          val lK = kt.getLong(0); val lT = kt.getLong(1)
          // consume right rows at or before (lK, lT); remember the last
          // one with the same key — sorted input makes it the latest
          while (rValid && (rK < lK || (rK == lK && rT <= lT))) {
            if (rK == lK) { lastCarry = carryP(rRow).copy(); lastKey = lK }
            advanceRight()
          }
          if (lastCarry != null && lastKey == lK) joined(lRow, lastCarry)
          else joined(lRow, nullCarry)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Register the strategy once per session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}

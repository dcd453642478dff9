package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Backward as-of join — the canonical "operator Spark lacks" extension
  * (builder guidance path (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Semantics: for every left row, attach the right row with the same
  * key and the greatest right-time ≤ left-time; left rows with no such
  * row keep nulls (LEFT ASOF). Matches DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`, which serves as
  * the differential oracle.
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted
  * within partitions by (key, time) — declared via
  * `requiredChildDistribution`/`requiredChildOrdering` so Catalyst's
  * EnsureRequirements inserts the exchanges and sorts — then a single
  * per-partition merge pass that carries the latest in-window right row
  * per key. O(n+m) per partition after the sort, no buffering beyond
  * one row: the same shape as a sort-merge join, so it scales exactly
  * like one (and at 100 TB the exchanges vanish if both sides are
  * bucketed by the key at write time).
  *
  * Constraints (checked by the [[AsOfJoin.joinAsOf]] wrapper): key and
  * time expressions must be 8-byte-primitive-backed (long/int/
  * timestamp), and right-side (key, time) pairs should be unique for
  * deterministic results (pre-aggregate duplicates away).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends SparkPlan with BinaryExecNode {

  private def rightOutNullable = right.output.map(_.withNullability(true))
  override def output: Seq[Attribute] = left.output ++ rightOutNullable

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val rOutN = rightOutNullable
    val lk = leftKey; val lt = leftTime; val rk = rightKey; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKT = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rKT = UnsafeProjection.create(Seq(rk, rt), rOut)
      val resultProj = UnsafeProjection.create(lOut ++ rOutN, lOut ++ rOutN)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        private var matchedRow: InternalRow = _
        private var matchedKey: Long = 0L
        private var hasMatch = false

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val kt = lKT(lRow)
          val lKeyV = kt.getLong(0)
          val lTimeV = kt.getLong(1)
          // advance the right side past every row at-or-before
          // (lKey, lTime), remembering the last same-key row seen
          var advance = true
          while (advance && rBuf.hasNext) {
            val peek = rKT(rBuf.head)
            val rKeyV = peek.getLong(0)
            val rTimeV = peek.getLong(1)
            if (rKeyV < lKeyV || (rKeyV == lKeyV && rTimeV <= lTimeV)) {
              val row = rBuf.next()
              if (rKeyV == lKeyV) {
                matchedRow = row.copy(); matchedKey = rKeyV; hasMatch = true
              }
            } else advance = false
          }
          val rSide = if (hasMatch && matchedKey == lKeyV) matchedRow else nullRight
          resultProj(joiner(lRow, rSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Register the planner strategy on a session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
  }

  /** `left ASOF LEFT JOIN right ON leftKey = rightKey AND leftTime >= rightTime`.
    * Pass resolved columns (`df("col")` style). Key/time columns must be
    * long/int/timestamp-backed.
    */
  def joinAsOf(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      Bridge.expression(leftKey), Bridge.expression(rightKey),
      Bridge.expression(leftTime), Bridge.expression(rightTime))
    Bridge.ofRows(spark, plan)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native expression: the order-preserving bit image of a double —
  * `bits ^ ((bits >> 63) & Long.MaxValue)` over `doubleToLongBits` —
  * so that for any doubles a ≤ b, `sortable(a) ≤ sortable(b)` as
  * signed longs (the radix-sort key transform: positive values keep
  * their IEEE bits, negative values flip their magnitude bits). The
  * transform is an involution, so the driver inverts it with the same
  * formula. Powers the exact-quantile radix walk: bucket keys are bit
  * prefixes (`sortable >> shift`), pure integer arithmetic with none
  * of the monotonicity hazards of log/division bucketing.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_sortable_bits requires a DOUBLE child, got ${child.dataType}")
  override def prettyName: String = "double_sortable_bits"

  protected override def nullSafeEval(input: Any): Any =
    DoubleSortableBits.sortable(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DoubleSortableBits.sortable($c);")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortableBits =
    copy(child = newChild)
}

object DoubleSortableBits {

  /** Shared by the interpreted path and generated code. */
  def sortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Inverse (the transform is an involution on the bit pattern). */
  def toDouble(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))

  /** Column API (classic-session Expression↔Column bridge). */
  def sortable_bits(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(DoubleSortableBits(Bridge.expression(c)))
  }
}

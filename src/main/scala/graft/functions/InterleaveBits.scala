package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native expression: Morton/Z-order interleave of the low 16 bits of
  * two longs into one 32-bit code — x on the even bit positions, y on
  * the odd. The Z-ORDER layout key (pipe_zorder): one tight loop in
  * codegen instead of the 96-node shift/mask expression tree the
  * HOF-free formulation needs, and the loop body is what you'd write
  * by hand. Bijective on [0, 2¹⁶)² (inverse in tests); a shared 2k-bit
  * prefix of the code implies shared k-bit prefixes in BOTH inputs —
  * the quad-tree rectangle bound parquet min/max pruning relies on.
  *
  * Range contract: inputs are MASKED to their low 16 bits — values
  * outside [0, 2¹⁶) collide by design rather than error (the Z-order
  * caller quantizes into 16-bit cells first, `pipe_zorder`). Callers
  * needing loud failure should range-check upstream.
  */
case class InterleaveBits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits requires two BIGINT children, got " +
        s"${left.dataType} and ${right.dataType}")
  override def prettyName: String = "interleave_bits"

  protected override def nullSafeEval(x: Any, y: Any): Any =
    InterleaveBits.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.InterleaveBits.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {

  /** Shared by the interpreted path and generated code. */
  def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Inverse: (x, y) back from the 32-bit code. */
  def deinterleave(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < 16) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** Column API (classic-session Expression↔Column bridge). */
  def interleave_bits(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(InterleaveBits(Bridge.expression(x), Bridge.expression(y)))
  }
}

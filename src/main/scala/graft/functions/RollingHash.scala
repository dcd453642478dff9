package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit polynomial rolling hash of a
  * string's UTF-8 bytes — `h = h * 31 + byte` with Long wrap-around.
  * The document-fingerprinting primitive (cheap, order-sensitive, one
  * pass — unlike md5 it exposes the rolling structure needed for
  * chunk-level fingerprints).
  *
  * Implemented with `doGenCode` so it participates in whole-stage
  * codegen (a Scala UDF here would box every row and break the codegen
  * span — see the builder guidance: native Expression > UDF).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  protected override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hashBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Shared by the interpreted path and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Column API (classic-session Expression↔Column bridge). */
  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RollingHash(Bridge.expression(c)))
  }
}

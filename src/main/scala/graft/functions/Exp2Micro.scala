package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic fixed-point base-2 EXPONENTIAL — [[Log2Micro]]'s
  * inverse, completing the engine's no-libm transcendental toolkit
  * (log2micro ∘ scale ∘ exp2micro = any fixed power or temperature
  * scaling, e.g. p^0.3 = exp2((3·log2micro(p)) DIV 10)):
  * `exp2micro(xm) = the defined fixed-point approximation of
  * 2^(xm/10⁶), in micro-units (×10⁶), as a BIGINT`.
  *
  * Algorithm (binary exponentiation by table, 20 fractional bits):
  *   1. split xm = k·10⁶ + f with k = floorDiv and 0 ≤ f < 10⁶
  *   2. extract f's binary expansion f/10⁶ = Σ b_i·2⁻ⁱ by exact
  *      integer doubling (t ← 2t; b_i = [t ≥ 10⁶], t ← t − 10⁶·b_i)
  *   3. m ← Π_{b_i=1} C_i where C_i = 2^(2⁻ⁱ) are SHARED DECIMAL
  *      LITERALS — 17-significant-digit constants pasted identically
  *      into this file and the DuckDB mirror, so both engines parse
  *      the same doubles and the fixed-order product is bit-identical
  *      (determinism comes from the shared literals + IEEE multiply,
  *      never from any runtime pow)
  *   4. im ← ⌊m·10⁶⌋ (exact-double floor), result ← im·2ᵏ via integer
  *      shifts (truncating right-shift = floor on the positive im).
  *
  * Domain: k ∈ [−63, 42] (result representable in micro-units);
  * outside, the expression fails loudly. The DuckDB mirror is
  * [[graft.operators.OracleSql.exp2microCtes]]; `Exp2MicroSpec` pins
  * the round trip against [[Log2Micro]] and true 2^x.
  */
case class Exp2MicroExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "exp2micro"

  protected override def nullSafeEval(x: Any): Any =
    Exp2Micro.exp2micro(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Exp2Micro.exp2micro($c)")

  override protected def withNewChildInternal(c: Expression): Exp2MicroExpr =
    copy(child = c)
}

object Exp2Micro {

  /** 2^(2⁻ⁱ) for i = 1..20 — the shared decimal literals (see class
    * doc; [[graft.operators.OracleSql.exp2microCtes]] embeds the SAME
    * text).
    */
  val BitConstants: Array[Double] = Array(
    1.4142135623730951, 1.189207115002721, 1.0905077326652577,
    1.0442737824274138, 1.0218971486541166, 1.0108892860517005,
    1.0054299011128027, 1.0027112750502025, 1.0013547198921082,
    1.0006771306930664, 1.0003385080526823, 1.0001692397053021,
    1.0000846162726944, 1.0000423072413958, 1.0000211533969647,
    1.0000105766425498, 1.0000052883072919, 1.0000026441501502,
    1.0000013220742012, 1.0000006610368821)

  /** Same-text constant list for the SQL mirror. */
  val BitConstantsSql: String = BitConstants.mkString("[", ", ", "]")

  def exp2micro(xm: Long): Long = {
    val k = Math.floorDiv(xm, 1000000L)
    if (k < -63L || k > 42L)
      throw new IllegalArgumentException(
        s"exp2micro: exponent $xm out of the representable range")
    var f = xm - k * 1000000L
    var m = 1.0
    var i = 0
    while (i < 20) {
      f *= 2L
      if (f >= 1000000L) { m *= BitConstants(i); f -= 1000000L }
      i += 1
    }
    val im = math.floor(m * 1000000.0).toLong
    if (k >= 0) im << k else im >> -k
  }

  def exp2micro(x: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Exp2MicroExpr(Bridge.expression(x)))
  }
}

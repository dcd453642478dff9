package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic fixed-point base-2 logarithm of a positive rational:
  * `log2micro(num, den) = the defined fixed-point approximation of
  * log2(num/den), in micro-units (×10⁶), as a BIGINT`.
  *
  * This is the engine's replacement for every libm `ln`/`log` that
  * used to sit inside a cross-engine oracle contract. libm
  * transcendentals are NOT correctly rounded and may differ by an ulp
  * between the JVM and DuckDB — a `floor`/`round` one ulp from a
  * boundary then flips the oracle hash on the next testdata refresh
  * (the round-7 `pipe_drift_psi` failure). `log2micro` closes that by
  * construction: it is a *defined function* built only from IEEE-754
  * correctly-rounded operations (integer bit length, one double
  * division, scaling by powers of two, multiply, compare), so both
  * engines produce the identical integer for every input — no margin
  * argument needed, no data luck.
  *
  * Algorithm (the classical bit-by-bit log2, unrolled 20 rounds):
  *   1. e ← bitlen(num) − bitlen(den)   (integer; bitlen via
  *      leading-zero count / `length(bin(x))`)
  *   2. m ← (num/den) / 2^e, renormalized into [1, 2) (the power of
  *      two is built exactly as `1L << |e|`; scaling by it is exact)
  *   3. 20×: m ← m²; if m ≥ 2 then emit bit 1 and halve m else emit
  *      bit 0. Squaring is one correctly-rounded IEEE multiply —
  *      identical on every IEEE-754 platform — and halving is exact.
  *   4. t ← e·2²⁰ + fracbits; result ← ⌊t·10⁶/2²⁰⌋ computed with a
  *      +64·2²⁰ offset so the single integer division has a
  *      non-negative numerator (truncating and flooring division
  *      agree, so Spark `DIV` and DuckDB `//` cannot diverge).
  *
  * 20 fractional bits give ~1e-6 resolution — the micro-unit grid —
  * and the result is within 2 micro-units of true log2. Callers treat
  * the value as *the* contract (a defined deterministic function),
  * never as "log2 up to rounding".
  *
  * The DuckDB mirror is [[graft.operators.OracleSql.log2microCtes]] —
  * the same four steps as a seed + 20-round recursive CTE. A
  * property spec pins the Scala loop against the CTE output
  * exhaustively over structured + random rationals.
  *
  * Codegen'd (static call) so corpus-sized users (`ta_lang_entropy`'s
  * per-vocab-row call) stay inside whole-stage spans.
  */
case class Log2MicroExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "log2micro"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    Log2Micro.log2micro(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Log2Micro.log2micro($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Log2MicroExpr =
    copy(left = l, right = r)
}

object Log2Micro {

  val FracBits = 20
  private val FracScale = 1L << FracBits // 1048576
  private val Offset = 64L << FracBits   // keeps the final DIV numerator ≥ 0

  /** Shared by the interpreted path and generated code. Mirrors
    * [[graft.operators.OracleSql.log2microCtes]] op-for-op; both must
    * change together (pinned by `Log2MicroSpec`).
    */
  def log2micro(num: Long, den: Long): Long = {
    if (num < 1L || den < 1L)
      throw new IllegalArgumentException(
        s"log2micro requires positive operands, got ($num, $den)")
    var e = java.lang.Long.numberOfLeadingZeros(den) -
      java.lang.Long.numberOfLeadingZeros(num) // bitlen(num) − bitlen(den)
    val p2 = if (e >= 0) (1L << e).toDouble else 1.0 / (1L << -e).toDouble
    var m = (num.toDouble / den.toDouble) / p2
    if (m < 1.0) { m *= 2.0; e -= 1 }
    var f = 0L
    var i = 0
    while (i < FracBits) {
      m = m * m
      f *= 2L
      if (m >= 2.0) { f += 1L; m /= 2.0 }
      i += 1
    }
    ((e.toLong * FracScale + f + Offset) * 1000000L) / FracScale - 64000000L
  }

  def log2micro(num: Column, den: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Log2MicroExpr(Bridge.expression(num), Bridge.expression(den)))
  }
}

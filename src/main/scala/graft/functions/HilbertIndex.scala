package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native expression: order-16 Hilbert-curve index of two 16-bit cell
  * coordinates — the OTHER space-filling layout key next to Z-order
  * (`InterleaveBits`). Same bijection contract ([0, 2¹⁶)² ↔ [0, 2³²),
  * inverse in tests, inputs masked to 16 bits like the Z-order key),
  * but strictly better locality: every Hilbert prefix is one
  * CONTIGUOUS curve segment inside one quad-tree cell, with no
  * Z-shape "seam jumps" between distant cells — consecutive codes are
  * always 4-adjacent points, so a sorted parquet file covers a
  * compact rectangle-ish region and range scans touch fewer files
  * (why Delta/Iceberg ship Hilbert clustering next to Z-ORDER).
  * The per-level rotation state makes this a genuinely iterative
  * computation — a fold no shift/mask expression tree expresses —
  * hence a native codegen loop; the oracle unrolls the same 16
  * rounds as chained CTEs.
  */
case class HilbertIndex(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires two BIGINT children, got " +
        s"${left.dataType} and ${right.dataType}")
  override def prettyName: String = "hilbert_index"

  protected override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertIndex.xy2d($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** (x, y) → d on the order-16 Hilbert curve (Warren/Wikipedia form:
    * per level, the quadrant digit is gray-decoded as (3·rx)⊕ry and
    * the frame reflects+transposes when descending a bottom quadrant).
    * Shared by the interpreted path and generated code.
    */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the frame for the next level; the
        // reflection complements against the FULL grid (n−1−x): only
        // bits below s are read after this level, and on those the
        // full-width complement equals the in-quadrant one while
        // staying non-negative (s−1−x would go negative when bit s is
        // set — the reason Wikipedia's rot takes n, not s)
        if (rx == 1) {
          x = 0xFFFFL - x
          y = 0xFFFFL - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: the curve position back to (x, y) — the bijection proof
    * the round-trip property test drives.
    */
  def d2xy(d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d0 & 0xFFFFFFFFL
    var s = 1L
    while (s < (1L << 16)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column API (classic-session Expression↔Column bridge). */
  def hilbert_index(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(HilbertIndex(Bridge.expression(x), Bridge.expression(y)))
  }

  /** The oracle's unrolled 16 rounds: chained CTEs `h0..h16` mutating
    * (x, y, d) with the identical per-level reflect+transpose; the
    * caller supplies the CTE producing columns (x, y … carried) named
    * `h0`. Emitted once here so the SQL and the loop can only drift
    * together.
    */
  def unrolledSql(carried: String): String =
    (0 until 16).map { i =>
      val s = 1L << (15 - i)
      val rx = s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END"
      val ry = s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END"
      s"""h${i + 1} AS (
         |  SELECT $carried,
         |    d + ${s * s} * xor(3 * rx, ry) AS d,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 65535 - y ELSE y END)
         |         ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 65535 - x ELSE x END)
         |         ELSE y END AS y
         |  FROM (SELECT *, $rx AS rx, $ry AS ry FROM h$i))""".stripMargin
    }.mkString(",\n")
}

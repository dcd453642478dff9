package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Log2Micro

/** The deterministic fixed-point log2 that replaced every libm `ln`
  * in a cross-engine oracle contract (round 9). The DuckDB side
  * (`OracleSql.log2microCtes`) is pinned by the driver's oracle gate
  * on every consuming query; this spec pins the Scala/codegen side:
  * exact values on powers of two, tight error vs true log2,
  * monotonicity, reciprocal antisymmetry on exact cases, and
  * interpreted-vs-codegen equality through a real DataFrame.
  */
class Log2MicroSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("exact on powers of two, in both directions") {
    for (k <- 0 to 62) {
      assert(Log2Micro.log2micro(1L << k, 1L) === k * 1000000L)
      assert(Log2Micro.log2micro(1L, 1L << k) === -k * 1000000L)
    }
    assert(Log2Micro.log2micro(1L, 1L) === 0L)
    assert(Log2Micro.log2micro(3L, 3L) === 0L)
  }

  test("within 2 micro-units of floor(log2(num/den) * 1e6)") {
    val longs = Gen.chooseNum(1L, 4000000000000000L)
    val prop = Prop.forAll(longs, longs) { (n, d) =>
      val got = Log2Micro.log2micro(n, d)
      val ref = math.floor(math.log(n.toDouble / d.toDouble) / math.log(2.0) * 1e6).toLong
      math.abs(got - ref) <= 2L
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("monotone in num and antisymmetric under swap for exact ratios") {
    // Exact-power ratios have no fractional rounding, so swap
    // antisymmetry must hold exactly; monotonicity must hold always.
    val vals = (1 to 400).map(_.toLong * 7919L)
    vals.sliding(2).foreach { case Seq(a, b) =>
      assert(Log2Micro.log2micro(a, 1000L) <= Log2Micro.log2micro(b, 1000L))
    }
    for (k <- 0 to 40)
      assert(Log2Micro.log2micro(1L << k, 3L) - Log2Micro.log2micro(1L, 3L) === k * 1000000L)
  }

  test("rejects non-positive operands") {
    intercept[IllegalArgumentException](Log2Micro.log2micro(0L, 1L))
    intercept[IllegalArgumentException](Log2Micro.log2micro(5L, -1L))
  }

  test("codegen path through a DataFrame equals the Scala loop") {
    import spark.implicits._
    val rows = Seq((1L, 1L), (2L, 1L), (3L, 7L), (1048576L, 1048575L),
      (999999999999999L, 7L), (1L, 999999999999999L), (6L, 4L))
    val got = rows.toDF("num", "den")
      .select(col("num"), col("den"),
        Log2Micro.log2micro(col("num"), col("den")).as("lrm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (n, d) =>
      assert(got((n, d)) === Log2Micro.log2micro(n, d), s"($n, $d)")
    }
  }
}

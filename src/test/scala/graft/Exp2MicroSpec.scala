package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Exp2Micro, Log2Micro}

/** The fixed-point base-2 exponential — Log2Micro's inverse. DuckDB
  * parity is pinned by the pipe_mix_temperature oracle row; this spec
  * pins the Scala/codegen side and the pair's round trip.
  */
class Exp2MicroSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("exact on integer exponents, both signs") {
    for (k <- 0 to 42)
      assert(Exp2Micro.exp2micro(k * 1000000L) === (1000000L << k))
    for (k <- 1 to 19)
      assert(Exp2Micro.exp2micro(-k * 1000000L) === (1000000L >> k))
    assert(Exp2Micro.exp2micro(500000L) === 1414213L) // floor(√2 · 1e6)
  }

  test("within 4 ppm of true 2^x across the mixture-weight range") {
    val xs = Gen.chooseNum(-20000000L, 20000000L)
    val prop = Prop.forAll(xs) { xm =>
      val got = Exp2Micro.exp2micro(xm).toDouble
      val truth = math.pow(2.0, xm / 1e6) * 1e6
      math.abs(got - truth) / truth < 4e-6 + 2.0 / truth
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("round trip with Log2Micro: exp2(log2(n)) returns n within 5 ppm") {
    val ns = Gen.chooseNum(1L, 1000000000000L)
    val prop = Prop.forAll(ns) { n =>
      val back = Exp2Micro.exp2micro(Log2Micro.log2micro(n, 1L))
      math.abs(back - n * 1000000.0) / (n * 1000000.0) < 5e-6
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("monotone, and loud outside the representable exponent range") {
    val pts = Seq(-5000000L, -1L, 0L, 1L, 999999L, 7000000L)
    pts.sliding(2).foreach { case Seq(a, b) =>
      assert(Exp2Micro.exp2micro(a) <= Exp2Micro.exp2micro(b))
    }
    intercept[IllegalArgumentException](Exp2Micro.exp2micro(43000000L))
    intercept[IllegalArgumentException](Exp2Micro.exp2micro(-64000000L))
  }

  test("codegen path through a DataFrame equals the Scala loop") {
    import spark.implicits._
    val xs = Seq(0L, 500000L, -300000L, 3141592L, -9999999L, 41000000L)
    val got = xs.toDF("xm")
      .select(col("xm"), Exp2Micro.exp2micro(col("xm")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(got(x) === Exp2Micro.exp2micro(x), s"x=$x"))
  }
}

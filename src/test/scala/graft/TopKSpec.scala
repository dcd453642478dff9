package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator

/** The typed bounded-heap top-k aggregator agrees with the window
  * row_number formulation (the two grouped-top-k strategies in this
  * engine; window wins below ~10³ candidates per group, the heap wins
  * above — see TopKAggregator scaladoc).
  */
class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("heap aggregator equals window top-k on the similarity query") {
    val fromWindow = SparkEntry.queries("ss_bruteforce_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap

    // same scored pairs, aggregated through the typed heap
    val scored = SparkEntry.queries("ss_bruteforce_topk")(spark, sf)
      .select("query_id", "vec_id", "cos") // already restricted to top-k
    val agg = new TopKAggregator(Similarity_K)
    val fromHeap = scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn)
      .collect().toMap

    fromWindow.foreach { case (q, expected) =>
      assert(fromHeap(q) == expected, s"query $q")
    }
  }

  test("heap aggregator keeps exactly k with deterministic tie-breaks") {
    val agg = new TopKAggregator(3)
    val data = Seq((1L, 0.5), (2L, 0.9), (3L, 0.5), (4L, 0.9), (5L, 0.1))
      .toDF("id", "score").as[(Long, Double)]
    val out = data.groupByKey(_ => 0).agg(agg.toColumn).collect().head._2
    // 0.9 ties broken by id asc; third slot: 0.5 tie broken by id asc
    assert(out == Seq((2L, 0.9), (4L, 0.9), (1L, 0.5)))
  }

  private def Similarity_K = graft.operators.Similarity.K
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PairGen

/** The salted two-level pair generator must produce EXACTLY the naive
  * within-bucket pair multiset for every cap — including caps small
  * enough to force multi-salt cells, the oversized-bucket path that
  * never fires on well-behaved LSH buckets.
  */
class PairGenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def naivePairs(members: Seq[(String, Long)]): Seq[(Long, Long)] =
    members.groupBy(_._1).toSeq.flatMap { case (_, ms) =>
      val ids = ms.map(_._2)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }

  private def salted(members: Seq[(String, Long)], cap: Int): Seq[(Long, Long)] =
    PairGen.saltedPairs(
        members.toDF("k", "id").select(col("k"), struct(col("id")).as("v")),
        Seq("k"), "id", cap = cap)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSeq

  test("multi-salt generation equals naive pairs on mixed bucket sizes") {
    // bucket sizes 1 (no pairs), 2, 3, 17, 40 — with cap=3 the larger
    // buckets split into 6/14 salts, exercising intra + inter cells
    val members =
      Seq("solo" -> 99L) ++
        (0L until 2L).map(i => "two" -> i) ++
        (10L until 13L).map(i => "three" -> i) ++
        (100L until 117L).map(i => "med" -> i) ++
        (1000L until 1040L).map(i => "big" -> i)
    val expected = naivePairs(members).sorted
    for (cap <- Seq(2, 3, 7, 4096)) {
      val got = salted(members, cap)
      assert(got.sorted == expected, s"cap=$cap mismatch")
      assert(got.size == got.toSet.size, s"cap=$cap produced duplicate pairs")
    }
  }

  test("a pair sharing two buckets is emitted once per bucket (multiplicity preserved)") {
    val members = Seq("b1" -> 1L, "b1" -> 2L, "b2" -> 1L, "b2" -> 2L, "b2" -> 3L)
    val got = salted(members, cap = 2)
    assert(got.sorted == Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("payload fields ride through both salt classes intact") {
    val df = (0L until 25L).map(i => ("k", i, s"payload_$i"))
      .toDF("k", "id", "tag")
      .select(col("k"), struct(col("id"), col("tag")).as("v"))
    val rows = PairGen.saltedPairs(df, Seq("k"), "id", cap = 4)
      .select(col("a.id"), col("a.tag"), col("b.id"), col("b.tag"))
      .as[(Long, String, Long, String)].collect()
    assert(rows.length == 25 * 24 / 2)
    rows.foreach { case (ai, at, bi, bt) =>
      assert(ai < bi)
      assert(at == s"payload_$ai" && bt == s"payload_$bi")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LocalityFile

/** O14 locality-config scan and its O9 hand-off to Spark's scheduler
  * via RDD preferred locations.
  */
class LocalitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("locality config parse applies the reference's node wrap rule") {
    // Scheduler.cc:93-95: node > worker_num → node %= worker_num
    val lines = Seq("0 1", "1 4", "2 9", "3 4", "", "4 2")
    val parsed = LocalityFile.parse(lines, numWorkers = 4)
    assert(parsed == Seq(
      (0, 1),
      (1, 4), // == numWorkers: NOT wrapped (rule is strictly greater)
      (2, 1), // 9 % 4
      (3, 4),
      (4, 2)))
  }

  test("malformed locality lines fail fast") {
    intercept[IllegalArgumentException](LocalityFile.parse(Seq("justonefield"), 4))
    intercept[NumberFormatException](LocalityFile.parse(Seq("a b"), 4))
  }

  test("chunk partitions surface their configured host to the scheduler") {
    val sc = spark.sparkContext
    val rdd = LocalityFile.chunksRDD(sc, Seq("0 2", "1 7", "2 1"), numWorkers = 3)
    // scheduler-visible surface: what DAGScheduler's delay scheduling
    // reads (RDD.preferredLocations is the public accessor over it)
    val locs = rdd.partitions.map(p => rdd.preferredLocations(p))
    assert(locs.toSeq == Seq(Seq("worker-2"), Seq("worker-1"), Seq("worker-1")))
    // and the RDD computes the dispatch table it advertised
    val table = rdd.collect().toSeq.sortBy(_._1)
    assert(table == Seq((0, "worker-2"), (1, "worker-1"), (2, "worker-1")))
  }
}

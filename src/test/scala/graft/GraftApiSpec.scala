package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The library-facing sketch and sweep-line API on [[Graft]], tested
  * on synthetic frames (no testdata) the way an embedding application
  * would call it.
  */
class GraftApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("hllSketch/hllEstimate: 10k synthetic keys within 15%") {
    val keys = (1 to 10000).map(i => s"key-$i").toDF("k")
    val est = Graft.hllEstimate(Graft.hllSketch(keys, col("k")))
      .collect().head.getAs[Long]("est_distinct")
    assert(math.abs(est - 10000).toDouble / 10000 <= 0.15, s"est=$est")
  }

  test("hllMerge: sketch of parts equals sketch of the whole") {
    val all = (1 to 5000).map(i => s"k$i").toDF("k")
    val parts = Seq(
      (1 to 2000).map(i => s"k$i").toDF("k"),
      // overlapping middle slice — merge must stay idempotent
      (1500 to 3500).map(i => s"k$i").toDF("k"),
      (3000 to 5000).map(i => s"k$i").toDF("k"))
    val merged = Graft.hllMerge(parts.map(Graft.hllSketch(_, col("k"))))
      .orderBy("reg").collect()
    val direct = Graft.hllSketch(all, col("k")).orderBy("reg").collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("peakConcurrency and intervalUtilization on a hand-built timeline") {
    // Three 10-minute intervals inside hour H: [00, 10), [05, 15),
    // [30, 40). Peak = 2 (first pair overlaps 5 min); covered =
    // 15 min + 10 min = 25 min.
    def ts(min: Int) = Timestamp.valueOf(f"2024-03-01 09:$min%02d:00")
    val ev = Seq(ts(0), ts(5), ts(30)).toDF("ts")
    val tenMin = 10L * 60 * 1000000
    val peak = Graft.peakConcurrency(ev, "ts", tenMin).collect()
    assert(peak.length == 1)
    assert(peak.head.getAs[Long]("n_opens") == 3L)
    assert(peak.head.getAs[Long]("peak_conc") == 2L)
    val util = Graft.intervalUtilization(ev, "ts", tenMin).collect()
    assert(util.length == 1)
    assert(util.head.getAs[Long]("covered_micros") == 25L * 60 * 1000000)
  }

  test("sketch and sweep API on empty inputs: empty out, never a throw") {
    val noKeys = Seq.empty[String].toDF("k")
    assert(Graft.hllSketch(noKeys, col("k")).count() == 0)
    val est = Graft.hllEstimate(Graft.hllSketch(noKeys, col("k"))).collect().head
    assert(est.getAs[Long]("n_set") == 0L)
    val noEvents = Seq.empty[Timestamp].toDF("ts")
    assert(Graft.peakConcurrency(noEvents, "ts", 1000000L).count() == 0)
    assert(Graft.intervalUtilization(noEvents, "ts", 1000000L).count() == 0)
    assert(Graft.concurrencyHistogram(noEvents, "ts", 1000000L).count() == 0)
  }

  test("intervalUtilization splits a boundary-crossing interval across hours") {
    // One 30-minute interval [09:50, 10:20): 10 min in hour 09,
    // 20 min in hour 10.
    val ev = Seq(Timestamp.valueOf("2024-03-01 09:50:00")).toDF("ts")
    val rows = Graft.intervalUtilization(ev, "ts", 30L * 60 * 1000000)
      .collect().map(r => (r.getTimestamp(0).toString, r.getAs[Long]("covered_micros")))
    assert(rows.toSeq == Seq(
      ("2024-03-01 09:00:00.0", 10L * 60 * 1000000),
      ("2024-03-01 10:00:00.0", 20L * 60 * 1000000)))
  }
}

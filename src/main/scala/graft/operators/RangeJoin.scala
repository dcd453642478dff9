package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval (range) join without an equi-key — the classic operator
  * Spark lacks natively. A raw `ts >= start AND ts < end` join has no
  * equality conjunct, so Catalyst can only plan a broadcast
  * nested-loop; fine when one side is tiny, quadratic death when both
  * sides are large. The standard large×large fix is binning: quantize
  * time into fixed-width buckets, explode each interval into the
  * buckets it covers, equi-join on the bucket, then apply the exact
  * range predicate. Each point lives in exactly one bucket, so a
  * (point, interval) pair meets at most once — no dedup needed — and
  * the join is a plain hash/merge equi-join that shuffles by bucket.
  *
  * Cost model: intervals explode into ceil(span/binWidth)+1 rows, so
  * pick binWidth near the typical interval span (here: 1 h bins for
  * 2 h windows → ≤3 rows per interval). Skewed buckets (one hot hour)
  * salt like any hot key; AQE's skew-join handles it at runtime.
  */
object RangeJoin {

  /** Join `points` (with timestamp column `tsCol`) to `intervals`
    * (with `[startCol, endCol)` timestamp bounds) on containment.
    * Column names must be distinct across the two sides. Empty or
    * inverted intervals (end ≤ start) match nothing and are dropped.
    */
  def binnedIntervalJoin(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    val p = points.withColumn("__bin", expr(s"unix_micros($tsCol) div $binMicros"))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(
          expr(s"unix_micros($startCol) div $binMicros"),
          expr(s"(unix_micros($endCol) - 1) div $binMicros"))))
    p.join(iv, "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Event density around anchor events: the first 40 events open
    // 2-hour windows; count the events and distinct users inside each.
    // Both join sides are the events table — the large×large shape
    // where binning matters (anchors could be millions at corpus
    // scale; the bin equi-join keeps it a shuffle, not a loop).
    "ev_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val iv = ev.filter(col("event_id") < 40)
        .select(col("event_id").as("interval_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
      binnedIntervalJoin(
          ev.select(col("user_id"), col("ts")), "ts",
          iv, "start_ts", "end_ts", binMicros = 3600L * 1000000L)
        .groupBy("interval_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("interval_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // The oracle states the semantics directly as an inequality join.
    "ev_range_join" ->
      """WITH iv AS (
        |  SELECT event_id AS interval_id, ts AS start_ts,
        |         ts + INTERVAL 2 HOUR AS end_ts
        |  FROM events WHERE event_id < 40)
        |SELECT interval_id, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM iv JOIN events e ON e.ts >= start_ts AND e.ts < end_ts
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key aggregation at scale.
  *
  * A single hot key (one user, one URL, one near-empty document text)
  * turns a groupBy shuffle into one straggler task at 100 TB. Salted
  * two-phase aggregation splits each key into `saltBuckets` synthetic
  * sub-keys, aggregates partially per sub-key (parallel), then
  * re-aggregates the small per-key partials. AQE's skew-join splitting
  * handles join-side skew; this is the aggregation-side analog.
  */
object SkewOps {

  /** Two-phase salted sum/count aggregation: semantically identical to
    * `df.groupBy(key).agg(count, sum(valueCol))` for any salt count,
    * but the phase-1 shuffle spreads each key over `saltBuckets` tasks.
    *
    * The salt is a deterministic hash of the row content — NOT
    * `spark_partition_id`/`monotonically_increasing_id`, which change
    * on stage retry and silently double-count or drop rows when only
    * part of a shuffle map output is recomputed (the SPARK-23207 class
    * of bug). Tradeoff: rows with identical (key, value) share a salt,
    * so salting is weaker when a hot key carries few distinct values.
    */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column, saltBuckets: Int): DataFrame = {
    df.select(key.as("k"), valueCol.as("v"))
      .withColumn("salt", pmod(hash(col("k"), col("v")), lit(saltBuckets)))
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))
  }
}

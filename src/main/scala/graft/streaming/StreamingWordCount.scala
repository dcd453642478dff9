package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Structured Streaming duals of the batch pipeline: the reference is
  * strictly batch (two barrier phases, `hw4.cc:28-30`), so these are
  * north-star extensions, not parity — the same tokenize/count and
  * windowed-aggregation semantics, incrementally maintained.
  *
  * Scale: streaming wordcount in complete mode holds O(distinct words)
  * state; the windowed variant holds O(open windows × types) and the
  * watermark bounds it — both are the standard production shapes.
  */
object StreamingWordCount {

  /** Incremental wordcount over a text-file stream. */
  def wordCountStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .text(inputDir)
      .select(explode(split(col("value"), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .count()

  /** Watermarked tumbling-window counts over an event stream with
    * schema (ts TIMESTAMP, event_type STRING, value DOUBLE).
    */
  def windowedEventCounts(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"))

  /** Streaming deduplication: drop exact-duplicate documents by
    * fingerprint as they arrive. `dropDuplicatesWithinWatermark` is the
    * state-bounded form — fingerprint state older than the watermark
    * horizon is evicted (plain `dropDuplicates("fp")` would keep one
    * state row per distinct fingerprint forever, the unbounded-state
    * failure mode). The minhash-LSH batch pass catches near-dups in
    * compaction.
    */
  def dedupStream(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")

  /** Run a streaming frame to a named in-memory sink and process all
    * currently-available input (synchronous — for tests/smoke).
    */
  def runToMemory(df: DataFrame, name: String, mode: String = "complete"): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }
}

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

  /** Watermarked SLIDING-window counts (15-minute window, 5-minute
    * slide) — the streaming dual of the batch ev_sliding_15m: the same
    * `window()` with a slideDuration fans each event into its 3
    * overlapping windows map-side; the watermark finalizes a window
    * once event time passes its end + delay, so state is bounded by
    * (watermark horizon / slide) open windows per group.
    */
  def slidingEventCounts(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "15 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("n_events"))

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

  /** Streaming incremental dedup — the streaming dual of the batch
    * `pipe_incremental_dedup`: arriving documents first drop exact
    * self-duplicates within the watermark, then anti-join the STATIC
    * corpus fingerprint index (broadcast; re-read per micro-batch, so
    * a nightly-compacted index is picked up without restart). Only
    * corpus-novel documents survive. Stateless beyond the watermarked
    * self-dedup — the corpus side never enters streaming state.
    */
  def incrementalDedupStream(spark: SparkSession, inputDir: String,
      schema: StructType, corpusFps: DataFrame): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .join(broadcast(corpusFps), Seq("fp"), "left_anti")

  /** Streaming session windows — the incremental dual of the batch
    * `ev_session_window` query: events within a 30-minute gap per user
    * merge into one session; the watermark finalizes (and emits, in
    * append mode) sessions once no earlier event can arrive, bounding
    * state to open sessions.
    */
  def sessionWindowStream(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Stream-static enrichment: each streaming event joins a static
    * (broadcast) dimension — stateless, re-planned per micro-batch, the
    * standard streaming lookup-join shape. The dimension re-reads its
    * source each batch, so slowly-changing dims pick up updates.
    */
  def enrichStream(spark: SparkSession, inputDir: String, schema: StructType,
      dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .join(broadcast(dim), col(streamKey) === col(dimKey))

  /** Stream-stream interval join: views joined to the same user's
    * clicks within the following 30 minutes. Both sides carry
    * watermarks so the join state (buffered unmatched rows) is evicted
    * once no counterpart can still arrive — the state-bounded form of
    * streaming correlation; without the time bound the state grows
    * forever.
    */
  def clickAfterViewJoin(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    clickAfterViewJoinImpl(spark, inputDir, schema, "inner")

  /** LEFT OUTER stream-stream interval join — the funnel-drop shape:
    * every view emits, matched eagerly with its clicks, or with NULL
    * click columns once the watermark proves no qualifying click can
    * still arrive (outer results are watermark-FINALIZED, not eager —
    * a view is only known unconverted when its 30-minute window is
    * wholly behind both watermarks). Same bounded state as the inner
    * form; the extra semantics cost nothing but the emission delay.
    */
  def clickAfterViewJoinOuter(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    clickAfterViewJoinImpl(spark, inputDir, schema, "leftOuter")

  private def clickAfterViewJoinImpl(spark: SparkSession, inputDir: String,
      schema: StructType, joinType: String): DataFrame = {
    val events = spark.readStream.schema(schema).parquet(inputDir)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    views.join(clicks,
      expr("v_user = c_user AND c_ts > v_ts AND c_ts <= v_ts + INTERVAL 30 MINUTES"),
      joinType)
  }

  /** Run a streaming frame to a named in-memory sink and process all
    * currently-available input (synchronous — for tests/smoke).
    */
  /** Streaming per-domain cap — the streaming dual of the batch
    * `pipe_domain_cap`, and the CUSTOM-STATE shape none of the
    * built-in streaming operators express (dropDuplicates dedupes,
    * windows aggregate — neither enforces an admission quota):
    * `flatMapGroupsWithState` keyed by source holds ONE long per
    * domain (docs admitted so far, across micro-batches) and admits a
    * doc iff the counter is below the cap. Within a micro-batch the
    * group's arrivals admit in doc_id order so the result is
    * deterministic regardless of partition interleaving. State is one
    * counter per domain — bounded by the domain universe, not the
    * stream; production adds a GroupStateTimeout to evict idle
    * domains.
    */
  def domainCapStream(spark: SparkSession, inputDir: String,
      schema: StructType, cap: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    spark.readStream.schema(schema).parquet(inputDir)
      .select(col("doc_id").cast("long"), col("source").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, docs: Iterator[(Long, String)], state: GroupState[Long]) =>
          val kept = state.getOption.getOrElse(0L)
          val room = math.max(0L, cap - kept).toInt
          // bounded selection of the `room` smallest ids — a max-heap
          // of size ≤ room, so a mega-domain micro-batch streams
          // through in O(cap) memory instead of materializing and
          // sorting the whole group
          val admit = if (room == 0) Seq.empty[Long] else {
            val pq = scala.collection.mutable.PriorityQueue.empty[Long]
            docs.foreach { case (id, _) =>
              if (pq.size < room) pq.enqueue(id)
              else if (id < pq.head) { pq.dequeue(); pq.enqueue(id) }
            }
            pq.toSeq.sorted
          }
          state.update(kept + admit.length)
          admit.iterator.map(id => (source, id))
      }.toDF("source", "doc_id")
  }

  /** Idempotent micro-batch MERGE sink via foreachBatch — the
    * production pattern for streaming upserts into a keyed store when
    * the sink has no native merge (plain parquet here): each batch
    * anti-joins the current target on the key and rewrites
    * target = (target − batch keys) ∪ batch, staged to a temp dir and
    * atomically swapped so readers never see a half-written store.
    * Replay safety comes from a processed-batch marker file: a batch
    * id seen before (checkpoint recovery re-delivers the last batch)
    * is skipped, making the merge exactly-once end to end even though
    * foreachBatch itself is at-least-once.
    */
  def mergeSink(df: DataFrame, keyCol: String, targetDir: String,
      checkpointDir: String): StreamingQuery = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val marker = Paths.get(targetDir + s".batch-$batchId.done")
        if (!Files.exists(marker)) {
          val spark = batch.sparkSession
          val target = Paths.get(targetDir)
          val merged =
            if (Files.exists(target)) {
              spark.read.parquet(targetDir)
                .join(batch.select(keyCol), Seq(keyCol), "left_anti")
                .unionByName(batch)
            } else batch.toDF()
          val stage = targetDir + s".stage-$batchId"
          merged.write.mode("overwrite").parquet(stage)
          // atomic swap: the staged store replaces the live one
          if (Files.exists(target)) {
            val old = Paths.get(targetDir + s".old-$batchId")
            Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
            Files.move(Paths.get(stage), target, StandardCopyOption.ATOMIC_MOVE)
            org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
          } else {
            Files.move(Paths.get(stage), target, StandardCopyOption.ATOMIC_MOVE)
          }
          Files.createFile(marker)
        }
        () // keep the lambda Unit-typed for the Scala overload
      }
      .start()
    q.processAllAvailable()
    q
  }

  def runToMemory(df: DataFrame, name: String, mode: String = "complete"): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }

  /** Same, with a durable checkpoint: source progress (processed files)
    * and aggregation state live under `checkpointDir`, so stopping and
    * re-starting with the SAME checkpoint resumes instead of
    * reprocessing — the exactly-once recovery contract.
    */
  def runToMemoryCheckpointed(
      df: DataFrame, name: String, checkpointDir: String,
      mode: String = "complete"): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .option("checkpointLocation", checkpointDir)
      .start()
    q.processAllAvailable()
    q
  }
}

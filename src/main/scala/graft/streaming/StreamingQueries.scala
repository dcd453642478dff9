package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Agg, OracleSql, QualityQueries}

/** Oracle-gated streaming surface: each query here runs a REAL
  * Structured Streaming job (readStream → stateful transform →
  * memory sink, all available data processed) and returns the final
  * result table, which the driver then compares against the same
  * DuckDB SQL that gates the batch dual. This pins the streaming
  * leg's VALUES through the correctness gate — the
  * batch-equivalence contract ("a windowed streaming aggregation
  * over a bounded input equals the batch aggregation") — where the
  * ScalaTest suite pins mechanics (watermarks, state eviction,
  * recovery, joins).
  *
  * Scale: identical state story to the batch duals — tumbling-window
  * state is O(open windows × event types) under the watermark, and
  * the memory sink here stands in for the parquet/Kafka sink a
  * production job uses (the sink sees only finalized aggregate rows,
  * never the event volume).
  */
object StreamingQueries {

  /** Memo cache for served static indexes the streaming admission rows
    * probe (the [[graft.operators.Similarity]] trainedCache idiom) —
    * keyed (session, dir, kind), registered with [[graft.CacheRegistry]]
    * so Tables.invalidate drops entries when testdata rewrites.
    */
  private val servedCache = graft.CacheRegistry.newCache()

  /** Stage the events table as a parquet DIRECTORY (the file-stream
    * source contract; the testdata ships one bare file) with the
    * loader's ts normalization applied once, batch-side.
    */
  private def stageEvents(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val ev = Tables.events(s, dir)
    (stage(ev, s"$dir/events.parquet",
      s"${stageRoot(dir)}/events"), ev.schema)
  }

  private def stageRoot(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_stream_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** Remove a run-scoped checkpoint/store tree after its results are
    * materialized — the admission rows mint UUID-scoped dirs per
    * execution, and without cleanup every bench pass accumulates
    * full copies under tmp.
    */
  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(); ()
  }

  /** Write `df` to `staged` once per SOURCE generation: the staged
    * copy is reused only while it is newer than the source parquet —
    * a driver-side testdata regeneration at the same path invalidates
    * it (a bare _SUCCESS check would silently serve stale data to
    * every streaming query).
    */
  private def stage(df: DataFrame, sourcePath: String, staged: String): String = {
    if (isStale(staged, sourcePath))
      df.write.mode(SaveMode.Overwrite).parquet(staged)
    staged
  }

  /** The stage() freshness rule as a predicate, for rows that stage
    * with custom layouts (split files, pinned mtimes): the staged copy
    * is stale when its marker is missing or not newer than the source
    * parquet — ONE definition, so a staleness-rule change can't be
    * applied to stage() and missed here.
    */
  private def isStale(staged: String, sourcePath: String): Boolean = {
    val marker = new java.io.File(staged, "_SUCCESS")
    val src = new java.io.File(sourcePath)
    !marker.exists() ||
      (src.exists() && src.lastModified() >= marker.lastModified())
  }

  /** Latest-batch-id merge of a foreachBatch upsert store over the
    * (hour, event_type) key: update mode re-emits a key whenever it
    * changes, so a key's LAST emission is its final total — shared by
    * the restart rows and the late-drop control.
    */
  private def latestByBatch(s: SparkSession, store: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("hour"), col("event_type"))
      .orderBy(col("batch_id").desc)
    s.read.parquet(s"$store/b*")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("hour", "event_type", "n_events", "sum_value")
      .orderBy("hour", "event_type")
  }

  /** Run `df` (a streaming frame) to a complete-mode memory sink and
    * return the final table. Complete mode emits every window at each
    * trigger regardless of the watermark, so the bounded-input run
    * yields exactly the batch result (append mode would hold back
    * windows the final watermark hasn't passed — correct for infinite
    * streams, wrong for a drain-and-compare gate).
    */
  private def drain(s: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("complete").format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STREAMING TOP-K PER WINDOW — the live leaderboard shape
    // (trending items, noisiest tenants): the STREAM maintains the
    // incremental per-(window, user) counts — that is the stateful
    // part, O(open windows × active users) under the watermark — and
    // the rank-and-cut runs on the drained aggregate table, the
    // standard split (a streaming aggregation cannot nest a ranking
    // window, and the sink-side aggregate is windows×users, nowhere
    // near event volume). Ties break toward the smaller user id, so
    // the leaderboard is deterministic.
    "st_topk_window" -> ((s, dir) => {
      val (staged, schema) = stageEvents(s, dir)
      val stream = s.readStream.schema(schema).parquet(staged)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("hour"))
        .orderBy(col("n_events").desc, col("user_id").asc)
      drain(s, stream, "st_topk_window")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("hour", "rank")
    }),

    // Streaming dual of ev_tumbling_hour, through the full streaming
    // machinery: watermarked event-time tumbling window, incremental
    // state, memory sink. Same aggregate expressions as the batch
    // query (dsum through DECIMAL — order-free, so incremental merge
    // order can never change a bit).
    "st_tumbling_hour" -> ((s, dir) => {
      val (staged, schema) = stageEvents(s, dir)
      val stream = s.readStream.schema(schema).parquet(staged)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Agg.dsum(col("value")).as("sum_value"))
      drain(s, stream, "st_tumbling_hour")
        .orderBy("hour", "event_type")
    }),

    // Streaming exact dedup through the gate: documents arrive as a
    // file stream with a synthetic event time, and
    // dropDuplicatesWithinWatermark keeps one row per fingerprint with
    // STATE BOUNDED by the watermark horizon (plain dropDuplicates
    // would hold every fingerprint forever — the unbounded-state
    // failure mode). The emitted row per fingerprint is
    // arrival-order-dependent, so the verified contract is the
    // fingerprint SET — exactly the batch DISTINCT. Append mode;
    // drained over the bounded corpus.
    "st_dedup_exact" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          expr("timestamp_micros(1000000000000000 + doc_id)").as("ts"))
      val staged = stage(docs, s"$dir/documents.parquet",
        s"${stageRoot(dir)}/docs")
      val deduped = s.readStream.schema(docs.schema).parquet(staged)
        .withColumn("fp", md5(col("text")))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("fp")
        .select("fp")
      val q = deduped.writeStream.outputMode("append").format("memory")
        .queryName("st_dedup_exact").start()
      try q.processAllAvailable() finally q.stop()
      s.table("st_dedup_exact").orderBy("fp")
    }),

    // CUSTOM STATE through the gate — the flatMapGroupsWithState
    // admission quota no built-in streaming operator expresses (one
    // counter per domain across micro-batches, a size-≤cap bounded
    // heap per batch). Drained over the bounded corpus in ONE
    // micro-batch (the file source takes all available files per
    // trigger by default), the admitted set is exactly the cap
    // smallest doc_ids per source — the deterministic contract the
    // batch SQL states. Cross-batch quota exhaustion (which this
    // single-batch drain can't see) stays pinned by ExtensionsSpec.
    "st_domain_cap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "source")
      val staged = stage(docs.coalesce(1), s"$dir/documents.parquet",
        s"${stageRoot(dir)}/docs_src")
      val capped = StreamingWordCount.domainCapStream(
        s, staged, docs.schema, QualityQueries.DomainCap)
      val q = capped.writeStream.outputMode("append").format("memory")
        .queryName("st_domain_cap").start()
      try q.processAllAvailable() finally q.stop()
      s.table("st_domain_cap").orderBy("source", "doc_id")
    }),

    // Stream-stream INTERVAL JOIN through the gate: every view matched
    // with the clicks that follow it within 30 minutes, both sides
    // watermarked so join state stays bounded by the interval + delay
    // horizon (the production attribution shape). Inner joins emit
    // eagerly on match — the watermark only EVICTS state — so draining
    // a bounded input yields exactly the batch inequality join. Append
    // mode (joins don't support complete).
    "st_click_after_view" -> ((s, dir) => {
      val (staged, schema) = stageEvents(s, dir)
      val joined = StreamingWordCount
        .clickAfterViewJoin(s, staged, schema)
        .select(col("view_id"), col("click_id"), col("v_user").as("user_id"))
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName("st_click_after_view").start()
      try q.processAllAvailable() finally q.stop()
      s.table("st_click_after_view")
        .orderBy("view_id", "click_id")
    }),

    // LEFT-OUTER stream-stream interval join through the gate — the
    // funnel-DROP shape the inner row above cannot express: every
    // view emits, eagerly per qualifying click or with a NULL click
    // once the watermark PROVES no qualifying click can still arrive.
    // Outer emissions are watermark-FINALIZED (not eager), so a
    // bounded drain must push the watermark past the last real
    // view's window: the staging appends one sentinel view+click
    // pair 3 h past max(ts) — 3 h > the 30-min join window + 1-h
    // delay, and BOTH sides need one because the global watermark is
    // the MIN across the two streams (ExtensionsSpec pins the
    // mechanics; this row pins the VALUES through the oracle). The
    // sentinel frame is derived from the agg row itself — no driver
    // action — and filtered out by its negative ids (the sentinels
    // can't join each other: c_ts > v_ts is strict and they share a
    // timestamp; the sentinel view never finalizes — nothing ever
    // passes ITS window — and the filter drops it regardless). The
    // oracle is the batch LEFT JOIN verbatim. State story: identical
    // bounded interval state to st_click_after_view — the outer
    // semantics buy the unmatched rows for nothing but emission
    // delay.
    "st_view_conversion" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sentinels = ev.agg(max(col("ts")).as("mts"))
        .select(explode(array(lit("view"), lit("click"))).as("event_type"),
          col("mts"))
        .select(
          when(col("event_type") === "view", lit(-1L)).otherwise(lit(-2L))
            .as("event_id"),
          (col("mts") + expr("INTERVAL 3 HOURS")).as("ts"),
          lit(-1L).as("user_id"),
          col("event_type"),
          lit(0.0).as("value"),
          lit(null).cast("string").as("props"))
      val staged = stage(ev.unionByName(sentinels),
        s"$dir/events.parquet", s"${stageRoot(dir)}/ev_outer")
      val joined = StreamingWordCount
        .clickAfterViewJoinOuter(s, staged, ev.schema)
        .select(col("view_id"), col("v_user").as("user_id"), col("click_id"))
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName("st_view_conversion").start()
      try q.processAllAvailable() finally q.stop()
      s.table("st_view_conversion").filter(col("view_id") >= 0L)
        .orderBy(col("view_id"), col("click_id").asc_nulls_first)
    }),

    // The HLL sketch maintained AS streaming aggregation state — the
    // streaming dual of sk_hll_registers, and the operational shape a
    // live distinct-count dashboard runs at 100 TB: documents arrive
    // in micro-batches (the staged corpus is split into 8 files and
    // drained 2 per trigger, so the register max-merge genuinely runs
    // INCREMENTALLY across 4 batches — not one degenerate pass),
    // shingles hash map-side, and the groupBy(reg).max(rho) state is
    // the sketch itself: 256 rows forever, regardless of stream
    // volume. No watermark needed — max is monotone, complete mode
    // re-emits the current registers each trigger. The oracle is the
    // batch sk_hll_registers SQL verbatim: the streaming fold and the
    // batch fold land on the identical sketch because register max is
    // order-free (the same commutative-monoid argument that makes the
    // sketch mergeable across executors makes it mergeable across
    // TIME).
    "st_hll_registers" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val staged = stage(docs.repartition(8), s"$dir/documents.parquet",
        s"${stageRoot(dir)}/docs_hll")
      val stream = graft.operators.SketchQueries.hllRegRho(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "2").parquet(staged)
            .select(explode(graft.operators.TextOps.shinglesOf(col("text")))
              .as("key"))
            .withColumn("h", md5(col("key"))))
        .groupBy("reg").agg(max(col("rho")).as("rho"))
      drain(s, stream, "st_hll_registers").orderBy("reg")
    }),

    // STREAM-STATIC enrichment join through the gate — the most common
    // production streaming shape of all: a live event stream joined to
    // a slow dimension (here the per-user signup-day cohort, computed
    // batch-side and BROADCAST). The join is stateless — no watermark,
    // no join state, each micro-batch enriches against the static
    // snapshot map-side — so the only streaming state is the
    // downstream (cohort_day × event_type) aggregation, calendar- and
    // type-bounded. At 100 TB the static side is the broadcast dim of
    // every q_join_broadcast argument; re-broadcast per batch is the
    // dimension-refresh dial. The oracle is the batch join verbatim.
    "st_enrich_join" -> ((s, dir) => {
      val (staged, schema) = stageEvents(s, dir)
      val cohort = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
      val stream = s.readStream.schema(schema).parquet(staged)
        .join(broadcast(cohort), Seq("user_id"))
        .groupBy(col("cohort_day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      drain(s, stream, "st_enrich_join")
        .orderBy("cohort_day", "event_type")
    }),

    // Streaming dual of ev_session_window — the MERGING window through
    // the gate: session state has no static shape (each new event can
    // extend a session or fuse two open sessions into one), which is
    // exactly what tumbling/sliding state never exercises. The
    // watermark bounds state to sessions whose gap can still close;
    // complete mode re-emits the merged sessions each trigger, so the
    // bounded drain equals the batch operator (update mode is the one
    // output mode session windows don't support; append would hold
    // back sessions the final watermark hasn't sealed). Grouping keys
    // are session_window + user_id — per-user sessions, the batch
    // dual's semantics, and state is O(open sessions), not O(events).
    "st_session_window" -> ((s, dir) => {
      val (staged, schema) = stageEvents(s, dir)
      val stream = s.readStream.schema(schema).parquet(staged)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("n_events"))
      drain(s, stream, "st_session_window")
        .orderBy("user_id", "session_start")
    }),

    // FIRST-SEEN REGISTRY as streaming state — the acquisition half of
    // ev_new_vs_returning run the way production runs it: a per-user
    // min(first-day) aggregation whose state IS the "seen users" map
    // (user-keyed, RocksDB-backed at scale — the same state shape as
    // streaming dedup), drained incrementally across 4 micro-batches
    // (8 staged files, 2 per trigger) so the min-merge genuinely folds
    // over TIME. min is monotone, so complete mode needs no watermark
    // — the commutative-monoid argument of st_hll_registers applied
    // to the calendar. The drained registry then yields the per-day
    // new-user census batch-side (streaming allows one aggregation
    // per query; the census is a sink-side rollup of final state).
    // Oracle = the batch first-day census verbatim.
    "st_new_users" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val staged = stage(ev.repartition(8), s"$dir/events.parquet",
        s"${stageRoot(dir)}/ev_first")
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "2").parquet(staged)
        .groupBy("user_id").agg(min(col("d")).as("fd"))
      drain(s, stream, "st_new_users")
        .groupBy(col("fd").cast("string").as("day"))
        .agg(count(lit(1)).as("new_users"))
        .orderBy("day")
    }),

    // Streaming dual of ev_sliding_15m: the slide fans each event into
    // its 3 overlapping windows map-side before the same incremental
    // aggregation — state O(open windows), output O(window count).
    "st_sliding_15m" -> ((s, dir) => {
      val (staged, schema) = stageEvents(s, dir)
      val stream = s.readStream.schema(schema).parquet(staged)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "15 minutes", "5 minutes")
          .getField("start").as("win_start"))
        .agg(count(lit(1)).as("n_events"),
          Agg.dsum(col("value")).as("sum_value"))
      drain(s, stream, "st_sliding_15m")
        .orderBy("win_start")
    }),

    // CRASH RECOVERY through the gate (round-10 verdict #5) — the one
    // behavior class the steady-state st_* rows never exercise:
    // EXACTLY-ONCE across a mid-run failure. Every execution stages
    // the events as 4 files, runs an update-mode aggregation one file
    // per micro-batch through a foreachBatch upsert sink (each batch's
    // updated rows land idempotently at an offset-derived path,
    // stamped with the batch id — the Delta/JDBC-upsert shape on plain
    // parquet), and INJECTS A CRASH in batch 1 after the sink write
    // but BEFORE the commit log records it — the hardest window: the
    // offset WAL already names batch 1, so the restarted query (same
    // checkpoint dir, injection off) must REPLAY it with identical
    // contents, and only the sink's by-batch-id idempotent overwrite
    // keeps the store exactly-once. The merged store (latest batch id
    // per key; a key's last update IS its total — update mode re-emits
    // a key whenever it changes) must equal the batch dual verbatim —
    // the same oracle SQL as st_tumbling_hour. State is unwatermarked
    // here because the 4-file replay is a bounded drain (files split
    // round-robin, so "late" rows are the norm); a production infinite
    // stream adds the watermark back and the recovery story is
    // unchanged (state reload + offset replay are watermark-agnostic).
    // Fresh checkpoint/store per execution: repeat runs re-exercise
    // the crash, not a cached recovery.
    "st_restart_upsert" -> ((s, dir) => {
            val ev = Tables.events(s, dir)
      val staged = stage(ev.repartition(4), s"$dir/events.parquet",
        s"${stageRoot(dir)}/ev_restart")
      // expected batch count derives from what was ACTUALLY staged
      // (not the literal 4): a testdata/staging refresh that changes
      // the file count must not flip a correct engine red; the crash
      // injects at batch 1, so >= 2 staged files is the precondition
      val nFiles = Option(new java.io.File(staged).listFiles()).toSeq
        .flatten.count(_.getName.endsWith(".parquet"))
      require(nFiles >= 2,
        s"staged $nFiles parquet files — the batch-1 crash injection " +
          "needs at least 2 one-file micro-batches")
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/restart_ckpt_$run"
      val store = s"${stageRoot(dir)}/restart_store_$run"
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      def start(injectCrash: Boolean) = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Agg.dsum(col("value")).as("sum_value"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          batchesSeen.incrementAndGet()
          df.withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Overwrite).parquet(s"$store/b$batchId")
          if (injectCrash && batchId == 1L) {
            crashed.set(true)
            throw new IllegalStateException(
              "injected crash: after sink write, before commit-log entry")
          }
        }
        .start()
      val q1 = start(injectCrash = true)
      // processAllAvailable unblocks on the injected failure (and
      // would return normally if injection never fired — caught by
      // the require below instead of hanging)
      try { q1.processAllAvailable(); () }
      catch { case _: Exception => () } finally q1.stop()
      require(crashed.get(), "crash injection never fired — staged file " +
        "count changed? the recovery contract was not exercised")
      val q2 = start(injectCrash = false)
      try q2.processAllAvailable() finally q2.stop()
      require(batchesSeen.get() >= nFiles + 1L,
        s"expected batch 1 to REPLAY after restart (batches 0,1 then " +
          s"replay-1..${nFiles - 1} = ${nFiles + 1} foreachBatch calls), " +
          s"saw ${batchesSeen.get()}")
      latestByBatch(s, store)
    }),

    // WATERMARKED CRASH RECOVERY (round-11 verdict #5) — replay and
    // watermark-driven state EVICTION exercised TOGETHER, the
    // composition st_restart_upsert deliberately skipped. The same
    // upsert-sink shape, but (a) the staged files are RANGE-
    // partitioned by ts with mtime-pinned oldest-first ordering
    // (FileStreamSource processes files in modification-time order),
    // so the watermark genuinely advances file over file and evicts
    // closed windows WITHOUT ever dropping data — a row in file i+1
    // is newer than file i's max minus the 30-minute delay, so its
    // window can never already be evicted, which is why the batch
    // dual stays the oracle verbatim; and (b) the crash injects in
    // batch 2, AFTER earlier batches committed state cleanups — a
    // require on the progress metrics (numRowsRemoved) proves
    // evictions actually happened pre-crash, so the restarted query
    // reloads a state store that has forgotten evicted windows and
    // must still replay batch 2 identically. Update mode emits a key
    // at every change, so a key's last pre-eviction emission is its
    // final total and the latest-batch-id merge equals the batch
    // aggregate. Fresh checkpoint/store per execution, as above.
    "st_restart_watermark" -> ((s, dir) => {
            val ev = Tables.events(s, dir)
      val staged = stage(ev.repartitionByRange(4, col("ts")),
        s"$dir/events.parquet", s"${stageRoot(dir)}/ev_restart_wm")
      // pin oldest-first processing: range partition i holds the i-th
      // time quartile and part files sort by name in partition order,
      // so mtime base+i makes FileStreamSource's mod-time order equal
      // time order (fixed epoch values keep re-runs deterministic and
      // stay far inside maxFileAge of the newest file)
      val parts = Option(new java.io.File(staged).listFiles()).toSeq
        .flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      val nFiles = parts.length
      require(nFiles >= 3,
        s"staged $nFiles parquet files — the batch-2 crash injection " +
          "needs at least 3 one-file micro-batches")
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/restartwm_ckpt_$run"
      val store = s"${stageRoot(dir)}/restartwm_store_$run"
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      // group on the window STRUCT, not .getField("start"): extracting
      // the field before the aggregation strips the event-time column
      // metadata the state-cleanup predicate is derived from, and the
      // store then never evicts (rem=0 forever) — the field is
      // flattened to `hour` inside the sink instead
      def start(injectCrash: Boolean) = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Agg.dsum(col("value")).as("sum_value"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          batchesSeen.incrementAndGet()
          df.select(col("window").getField("start").as("hour"),
              col("event_type"), col("n_events"), col("sum_value"))
            .withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Overwrite).parquet(s"$store/b$batchId")
          if (injectCrash && batchId == 2L) {
            crashed.set(true)
            throw new IllegalStateException(
              "injected crash: after sink write, before commit-log entry")
          }
        }
        .start()
      val q1 = start(injectCrash = true)
      try { q1.processAllAvailable(); () }
      catch { case _: Exception => () }
      val evictedPreCrash = q1.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsRemoved).sum
      q1.stop()
      require(crashed.get(), "crash injection never fired — staged file " +
        "count changed? the recovery contract was not exercised")
      require(evictedPreCrash > 0L,
        "watermark never evicted state before the crash — the row would " +
          "silently degrade to the unwatermarked st_restart_upsert shape")
      val q2 = start(injectCrash = false)
      try q2.processAllAvailable() finally q2.stop()
      require(batchesSeen.get() >= nFiles + 1L,
        s"expected batch 2 to REPLAY after restart, saw only " +
          s"${batchesSeen.get()} foreachBatch calls for $nFiles files")
      latestByBatch(s, store)
    }),

    // LATE-DATA DROP as a NEGATIVE CONTROL — every other st_* row
    // stages so that nothing is ever late (that is what makes the
    // batch SQL the oracle); this row proves the OTHER half of the
    // watermark contract: data arriving behind the watermark is
    // DROPPED, exactly and only it. Staging splits the corpus at the
    // fixed-interval boundary min(ts) + 100 h (computed as a
    // broadcast agg leg — no driver action — and recomputable in SQL,
    // unlike a sampled repartitionByRange boundary): the on-time side
    // stages time-ordered (the st_restart_watermark no-drop
    // argument), the early quartile stages LAST, arriving when the
    // watermark sits ~520 h past its newest window — so the streaming
    // result is the batch aggregate over ts >= boundary, the oracle
    // verbatim, and a require on numRowsDroppedByWatermark proves the
    // drop actually fired (a complete-mode or unwatermarked engine
    // that counts everything flips red on the hash; an engine that
    // never drops flips red on the require). Update mode + the
    // by-batch-id store merge, as in st_restart_upsert.
    // STREAMING LSH ADMISSION (round-13 verdict #5) — the
    // pipe_incremental_dedup shape as a live admission stream: each
    // micro-batch of NEW docs is fingerprinted and band-hashed
    // (only the delta pays shingling, per batch), checked against
    // (a) the STATIC corpus index — fingerprint set + band index,
    // computed once and materialized, the precomputed signature
    // index a 100 TB deployment serves — and (b) the GROWING delta
    // index accumulated from earlier micro-batches, plus
    // first-occurrence self-dedup inside the batch. The admission
    // index lives in the SINK (by-batch-id parquet tables), not the
    // Spark state store, deliberately: at scale a fingerprint index
    // is a SERVED TABLE that outlives any one stream job (the
    // ss_ivf_persist lifecycle for dedup), and the by-batch-id
    // layout is what makes replay idempotent. Crash contract =
    // st_restart_upsert verbatim: the crash injects in batch 1 AFTER
    // the sink writes but BEFORE the commit log records them — the
    // replayed batch re-reads only indexes from batches < 1 (its own
    // pre-crash writes are excluded by batch id, then overwritten),
    // so recovery is exactly-once by construction and the require
    // proves the replay happened. Stream arrival order = doc_id
    // order (ascending range staging + pinned mtimes, the
    // st_restart_watermark trick), so the batch dual in doc_id order
    // is the oracle verbatim.
    "st_incremental_dedup" -> ((s, dir) => {
      import graft.operators.Dedup
      val isNew = pmod(col("doc_id"), lit(10)) === 7
      val docs = Tables.documents(s, dir)
      val delta = docs.filter(isNew)
      val staged = stage(delta.repartitionByRange(4, col("doc_id")),
        s"$dir/documents.parquet", s"${stageRoot(dir)}/doc_admission")
      // pin oldest-first processing so micro-batch order is doc_id
      // order (FileStreamSource processes files in mtime order; range
      // partition i holds the i-th doc_id quantile and part files
      // sort by name in partition order)
      val parts = Option(new java.io.File(staged).listFiles()).toSeq
        .flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      val nFiles = parts.length
      require(nFiles >= 2,
        s"staged $nFiles parquet files — the batch-1 crash injection " +
          "needs at least 2 one-file micro-batches")
      // static corpus index — the served fingerprint/band tables of
      // the nightly-crawl shape, memoized per (session, dir) like
      // every served index (rebuilding per execution would price the
      // index build into every admission; bench reps probe the SAME
      // static corpus)
      val corpusFp = graft.CacheRegistry.cached[DataFrame](
        servedCache, s, dir, "admissionFpIdx")(
        docs.filter(!isNew)
          .select(md5(col("text")).as("fp")).distinct()
          .localCheckpoint(false))
      val corpusBnd = graft.CacheRegistry.cached[DataFrame](
        servedCache, s, dir, "admissionBandIdx")(
        Dedup.bandFrameOf(docs.filter(!isNew))
          .select("band_idx", "band_hash").distinct()
          .localCheckpoint(false))
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/admission_ckpt_$run"
      val store = s"${stageRoot(dir)}/admission_store_$run"
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      // accumulated delta index from batches STRICTLY BEFORE b — a
      // replayed batch must not see its own pre-crash writes
      def prior(s2: SparkSession, sub: String, b: Long,
                schema: org.apache.spark.sql.types.StructType): DataFrame = {
        val paths = Option(new java.io.File(s"$store/$sub").listFiles())
          .toSeq.flatten
          .filter(f => f.getName.startsWith("b") &&
            f.getName.drop(1).forall(_.isDigit) &&
            f.getName.drop(1).toLong < b)
          .map(_.getPath)
        if (paths.isEmpty)
          s2.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else s2.read.parquet(paths: _*)
      }
      def start(injectCrash: Boolean) = s.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          batchesSeen.incrementAndGet()
          val s2 = df.sparkSession
          val fps = df.select(col("doc_id"), md5(col("text")).as("fp"))
            .localCheckpoint(false)
          val bnd = Dedup.bandFrameOf(df).localCheckpoint(false)
          val priorFp = prior(s2, "fps", batchId, fps.schema)
          val priorBnd = prior(s2, "bands", batchId, bnd.schema)
          val exactIds = fps.join(corpusFp, Seq("fp"), "left_semi")
            .select("doc_id")
            .union(fps.join(priorFp.select("fp"), Seq("fp"), "left_semi")
              .select("doc_id"))
            .union(fps.as("a").join(fps.as("b"),
                col("a.fp") === col("b.fp") &&
                  col("b.doc_id") < col("a.doc_id"))
              .select(col("a.doc_id")))
            .distinct().withColumn("exact_dup", lit(true))
          val bk = Seq("band_idx", "band_hash")
          val nearIds = bnd.join(corpusBnd, bk, "left_semi")
            .select("doc_id")
            .union(bnd.join(priorBnd.select(bk.map(col): _*), bk, "left_semi")
              .select("doc_id"))
            .union(bnd.as("a").join(bnd.as("b"),
                col("a.band_idx") === col("b.band_idx") &&
                  col("a.band_hash") === col("b.band_hash") &&
                  col("b.doc_id") < col("a.doc_id"))
              .select(col("a.doc_id")))
            .distinct().withColumn("near_dup", lit(true))
          val status = df.select(col("doc_id"))
            .join(exactIds, Seq("doc_id"), "left")
            .join(nearIds, Seq("doc_id"), "left")
            .select(col("doc_id"),
              when(col("exact_dup"), "exact_dup")
                .when(col("near_dup"), "near_dup")
                .otherwise("kept").as("status"))
          // idempotent by-batch-id writes: status + this batch's
          // index contribution (replay overwrites identically)
          status.write.mode(SaveMode.Overwrite)
            .parquet(s"$store/status/b$batchId")
          fps.write.mode(SaveMode.Overwrite)
            .parquet(s"$store/fps/b$batchId")
          bnd.write.mode(SaveMode.Overwrite)
            .parquet(s"$store/bands/b$batchId")
          if (injectCrash && batchId == 1L) {
            crashed.set(true)
            throw new IllegalStateException(
              "injected crash: after sink writes, before commit-log entry")
          }
        }
        .start()
      val q1 = start(injectCrash = true)
      try { q1.processAllAvailable(); () }
      catch { case _: Exception => () } finally q1.stop()
      require(crashed.get(), "crash injection never fired — staged file " +
        "count changed? the recovery contract was not exercised")
      val q2 = start(injectCrash = false)
      try q2.processAllAvailable() finally q2.stop()
      require(batchesSeen.get() >= nFiles + 1L,
        s"expected batch 1 to REPLAY after restart, saw only " +
          s"${batchesSeen.get()} foreachBatch calls for $nFiles files")
      // EAGERLY materialize the read-back, then remove this run's
      // UUID-scoped checkpoint/store trees — without the cleanup every
      // bench pass (reps × re-measure) accumulates full copies of the
      // delta fingerprint/band/status tables under tmp. The staged
      // source stays (it is generation-keyed and reused across runs).
      val out = s.read.parquet(s"$store/status/b*").orderBy("doc_id")
        .localCheckpoint(true)
      Seq(ckpt, store).foreach(p => rmTree(new java.io.File(p)))
      out
    }),

    // STREAMING ANN ADMISSION (round-13 verdict stretch #7) — the
    // st_incremental_dedup crash-replay harness pointed at the
    // PUBLISHED IVF index: new vectors (the ss_ivf_admit delta —
    // doc-id slice, re-keyed, reversed coordinates) arrive as a
    // vec_id-ordered file stream and each micro-batch is assigned
    // against the READ-BACK centroids (published BEFORE the stream
    // starts; no retrain in any batch — the serving contract) and
    // appended BY BATCH ID to the admission log the delta segment
    // compacts from. Exactly-once under crash-replay: the crash
    // injects in batch 1 after the sink write but before the commit
    // log records it; the restart re-processes batch 1 and its
    // by-batch-id overwrite replaces the pre-crash write identically.
    // Admission is per-vector stateless (unlike the dedup row there is
    // no prior-index read to scope), so the double-admission failure
    // mode is LOG INFLATION — the require proves the replayed log
    // still holds exactly one row per delta vector. Oracle = the batch
    // dual (same delta, same micro-L2 argmin, order-free).
    "st_ivf_admit" -> ((s, dir) => {
      import graft.operators.{Similarity, TextOps}
      // publish-once, resolved on the driver before the stream starts
      val root = Similarity.publishedIndexRoot(s, dir)
      val delta = Tables.embeddings(s, dir)
        .filter(pmod(col("vec_id"), lit(10)) === 3)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          reverse(TextOps.toDouble(col("embedding"))).as("e"))
      val expected = delta.count()
      val staged = stage(delta.repartitionByRange(4, col("vec_id")),
        s"$dir/embeddings.parquet", s"${stageRoot(dir)}/vec_admission")
      val parts = Option(new java.io.File(staged).listFiles()).toSeq
        .flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      val nFiles = parts.length
      require(nFiles >= 2,
        s"staged $nFiles parquet files — the batch-1 crash injection " +
          "needs at least 2 one-file micro-batches")
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/vec_admission_ckpt_$run"
      val store = s"${stageRoot(dir)}/vec_admission_store_$run"
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      def start(injectCrash: Boolean) = s.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          batchesSeen.incrementAndGet()
          val s2 = df.sparkSession
          val dims = df
            .select(col("vec_id"), posexplode(col("e")).as(Seq("p", "x")))
            .select(col("vec_id"), (col("p") + 1).cast("int").as("dim"),
              col("x"))
          val cents = s2.read.parquet(s"$root/centroids")
          Similarity.assignL2(dims, cents)
            .write.mode(SaveMode.Overwrite).parquet(s"$store/asg/b$batchId")
          if (injectCrash && batchId == 1L) {
            crashed.set(true)
            throw new IllegalStateException(
              "injected crash: after sink writes, before commit-log entry")
          }
        }
        .start()
      val q1 = start(injectCrash = true)
      try { q1.processAllAvailable(); () }
      catch { case _: Exception => () } finally q1.stop()
      require(crashed.get(), "crash injection never fired — staged file " +
        "count changed? the recovery contract was not exercised")
      val q2 = start(injectCrash = false)
      try q2.processAllAvailable() finally q2.stop()
      require(batchesSeen.get() >= nFiles + 1L,
        s"expected batch 1 to REPLAY after restart, saw only " +
          s"${batchesSeen.get()} foreachBatch calls for $nFiles files")
      val out = s.read.parquet(s"$store/asg/b*").orderBy("vec_id")
        .localCheckpoint(true)
      val n = out.count()
      require(n == expected,
        s"admission log holds $n rows for $expected delta vectors — " +
          "a replayed batch double-admitted (exactly-once broken)")
      Seq(ckpt, store).foreach(p => rmTree(new java.io.File(p)))
      out
    }),

    // STREAMING EXACT-SUBSTRING ADMISSION (round-15 verdict #4 — the
    // last batch/index/streaming asymmetry: dd_suffix_spans /
    // pipe_suffix_clean had no incremental tier): delta docs (the
    // st_incremental_dedup slice, doc_id % 10 = 7) arrive as a
    // doc_id-ordered file stream and each micro-batch is probed
    // against the PUBLISHED L-gram index of the static corpus — the
    // servable form of the suffix-class index: a position of a new
    // doc duplicates an existing L-char span iff its L-gram equals
    // some indexed L-gram, so the probe is exact with no prefix
    // doubling per batch (the doubling built the batch index once;
    // admission only needs membership; the oracle states membership
    // on gram strings verbatim — fingerprint equality is gram
    // equality, see gramFp). Matches against (a) the
    // static index, (b) earlier batches' delta grams (batch-id-scoped
    // prior reads — the st_incremental_dedup recovery contract), and
    // (c) same-batch docs with smaller doc_id; ranged staging makes
    // batch order doc_id order, so (b) ∪ (c) ≡ "delta docs with
    // smaller doc_id" and the batch dual is order-free SQL. The
    // served tables (static index, prior-batch delta grams) store
    // 128-bit [[graft.operators.Dedup.gramFp]] fingerprints, not raw
    // grams (round-16 verdict #3): the probe hashes each batch gram
    // once (two codegen'd xxhash64 lanes) and semi-joins on
    // (fp1, fp2); only the SAME-BATCH self-match keeps the string
    // form, batch-local and never persisted. Matched
    // positions merge per doc into maximal spans (gaps-and-islands,
    // per-doc window — never global). Crash contract verbatim: inject
    // in batch 1 after the sink writes, before the commit log;
    // replay's by-batch-id overwrite replaces the pre-crash writes
    // identically, and the require pins the span log to one row per
    // (doc, span_start) — inflation is the failure mode. Scale: per
    // batch one gram explode (batch chars rows) + two semi-joins
    // against served tables + a per-doc window; nothing corpus-wide
    // re-runs per batch.
    "st_suffix_admit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Dedup
      val spanL = Dedup.SuffixSpanL
      val isNew = pmod(col("doc_id"), lit(10)) === 7
      val docs = Tables.documents(s, dir)
      def gramsOf(d: DataFrame) = Dedup.suffixGramsOf(d, spanL)
      val delta = docs.filter(isNew).select("doc_id", "text")
      val staged = stage(delta.repartitionByRange(4, col("doc_id")),
        s"$dir/documents.parquet", s"${stageRoot(dir)}/suffix_admission")
      val parts = Option(new java.io.File(staged).listFiles()).toSeq
        .flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      val nFiles = parts.length
      require(nFiles >= 2,
        s"staged $nFiles parquet files — the batch-1 crash injection " +
          "needs at least 2 one-file micro-batches")
      // the published static index (the dd_suffix_index_build parquet
      // table, publish-once per session — resolved on the DRIVER
      // before any stream starts, the st_ivf_admit rule): every
      // micro-batch probes the READ-BACK table, so admission never
      // silently rebuilds the index it serves from
      val staticIdx = s.read.parquet(
        graft.operators.Dedup.publishedSuffixGramIndex(s, dir))
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/suffix_admission_ckpt_$run"
      val store = s"${stageRoot(dir)}/suffix_admission_store_$run"
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      // delta-gram index accumulated from batches STRICTLY BEFORE b —
      // a replayed batch must not see its own pre-crash writes
      def prior(s2: SparkSession, b: Long,
                schema: org.apache.spark.sql.types.StructType): DataFrame = {
        val paths = Option(new java.io.File(s"$store/grams").listFiles())
          .toSeq.flatten
          .filter(f => f.getName.startsWith("b") &&
            f.getName.drop(1).forall(_.isDigit) &&
            f.getName.drop(1).toLong < b)
          .map(_.getPath)
        if (paths.isEmpty)
          s2.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else s2.read.parquet(paths: _*)
      }
      def start(injectCrash: Boolean) = s.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          batchesSeen.incrementAndGet()
          val s2 = df.sparkSession
          val bg = gramsOf(df)
            .select(Seq(col("doc_id"), col("p"), col("g")) ++
              graft.operators.Dedup.gramFp(col("g")): _*)
            .localCheckpoint(false)
          // no localCheckpoint: the distinct-fp frame has exactly ONE
          // consumer (the by-batch-id gram write below — prior() only
          // needs its schema), so checkpointing it materialized the
          // frame once per micro-batch just to re-read it for the
          // write (round-17: one job per batch saved; bg stays
          // checkpointed, it feeds four branches)
          val fpOnly = bg.select("fp1", "fp2").distinct()
          val priorFp = prior(s2, batchId, fpOnly.schema)
          // Probe direction (round-17): a left-semi can only broadcast
          // its RIGHT side, so `bg ⋉ staticIdx` sort-merge-joined the
          // MILLIONS-row served index (shuffle + sort of the index
          // EVERY micro-batch). Inverted: the index streams through a
          // BroadcastHashJoin against the broadcast batch grams — the
          // 100-TB-correct asymmetry (index ≫ batch; the served table
          // never shuffles, the batch side ships). Row-identical:
          // staticIdx is unique per (fp1, fp2) (distinct grams), so
          // the inner join emits each matching bg row once; priorFp
          // can repeat a fingerprint across batch segments, and the
          // final `.distinct()` (already present for the 3-way union)
          // absorbs that multiplicity.
          val bgk = bg.select("doc_id", "p", "fp1", "fp2")
          val matched = staticIdx.join(broadcast(bgk), Seq("fp1", "fp2"))
            .select("doc_id", "p")
            .union(priorFp.join(broadcast(bgk), Seq("fp1", "fp2"))
              .select("doc_id", "p"))
            .union(bg.as("a").join(bg.as("b"),
                col("a.g") === col("b.g") && col("b.doc_id") < col("a.doc_id"),
                "left_semi")
              .select(col("doc_id"), col("p")))
            .distinct()
          val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("p"))
          val spans = matched
            .withColumn("grp", col("p") - row_number().over(wIsl))
            .groupBy("doc_id", "grp")
            .agg(min(col("p")).as("s0"), max(col("p")).as("s1"))
            .select(col("doc_id"), col("s0").cast("long").as("span_start"),
              (col("s1") - col("s0") + spanL).cast("long").as("span_len"))
          // idempotent by-batch-id writes: spans + this batch's gram
          // contribution (replay overwrites identically)
          spans.write.mode(SaveMode.Overwrite)
            .parquet(s"$store/spans/b$batchId")
          fpOnly.write.mode(SaveMode.Overwrite)
            .parquet(s"$store/grams/b$batchId")
          if (injectCrash && batchId == 1L) {
            crashed.set(true)
            throw new IllegalStateException(
              "injected crash: after sink writes, before commit-log entry")
          }
        }
        .start()
      val q1 = start(injectCrash = true)
      try { q1.processAllAvailable(); () }
      catch { case _: Exception => () } finally q1.stop()
      require(crashed.get(), "crash injection never fired — staged file " +
        "count changed? the recovery contract was not exercised")
      val q2 = start(injectCrash = false)
      try q2.processAllAvailable() finally q2.stop()
      require(batchesSeen.get() >= nFiles + 1L,
        s"expected batch 1 to REPLAY after restart, saw only " +
          s"${batchesSeen.get()} foreachBatch calls for $nFiles files")
      val out = s.read.parquet(s"$store/spans/b*")
        .orderBy("doc_id", "span_start").localCheckpoint(true)
      val n = out.count()
      val nDistinct = out.dropDuplicates("doc_id", "span_start").count()
      require(n == nDistinct,
        s"span log holds $n rows but $nDistinct distinct (doc, start) — " +
          "a replayed batch double-admitted (exactly-once broken)")
      Seq(ckpt, store).foreach(p => rmTree(new java.io.File(p)))
      out
    }),

    // STREAMING ERASURE (pipe_forget's arrival path): right-to-be-
    // forgotten requests don't come in batches — they arrive
    // continuously, and the serving index must converge to the erased
    // state across restarts. The pipe_forget delete slice
    // (doc_id % 97 = 13) arrives as a doc_id-ordered file stream; each
    // micro-batch writes its doc_ids as a TOMBSTONE segment BY BATCH
    // ID (idempotent overwrite — the established exactly-once
    // contract), the crash injects in batch 1 after the tombstone
    // write but before the commit log records it, and the restart's
    // replay overwrites the same segment identically. Erasure is
    // naturally idempotent, so the failure mode under replay is
    // tombstone-log INFLATION (double-counted deletes corrupting
    // audit totals) — the require pins the log to exactly one row per
    // request. Output = the surviving fingerprint index (corpus
    // anti-join tombstones), the state a forget-compliant serving
    // tier reads; oracle = the batch dual. Scale: tombstones are the
    // small side by construction — each batch is one broadcast-scale
    // write, the anti-join is the only corpus-wide pass.
    "st_forget" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val delReq = docs.filter(col("doc_id") % 97 === 13)
        .select(col("doc_id"))
      val expectedDel = delReq.count()
      val staged = stage(delReq.repartitionByRange(4, col("doc_id")),
        s"$dir/documents.parquet", s"${stageRoot(dir)}/forget_req")
      val parts = Option(new java.io.File(staged).listFiles()).toSeq
        .flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      val nFiles = parts.length
      require(nFiles >= 2,
        s"staged $nFiles parquet files — the batch-1 crash injection " +
          "needs at least 2 one-file micro-batches")
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/forget_ckpt_$run"
      val store = s"${stageRoot(dir)}/forget_store_$run"
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      def start(injectCrash: Boolean) = s.readStream.schema(delReq.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          batchesSeen.incrementAndGet()
          df.select("doc_id")
            .write.mode(SaveMode.Overwrite).parquet(s"$store/tomb/b$batchId")
          if (injectCrash && batchId == 1L) {
            crashed.set(true)
            throw new IllegalStateException(
              "injected crash: after tombstone write, before commit-log entry")
          }
        }
        .start()
      val q1 = start(injectCrash = true)
      try { q1.processAllAvailable(); () }
      catch { case _: Exception => () } finally q1.stop()
      require(crashed.get(), "crash injection never fired — staged file " +
        "count changed? the recovery contract was not exercised")
      val q2 = start(injectCrash = false)
      try q2.processAllAvailable() finally q2.stop()
      require(batchesSeen.get() >= nFiles + 1L,
        s"expected batch 1 to REPLAY after restart, saw only " +
          s"${batchesSeen.get()} foreachBatch calls for $nFiles files")
      val tomb = s.read.parquet(s"$store/tomb/b*").localCheckpoint(true)
      val nT = tomb.count()
      require(nT == expectedDel,
        s"tombstone log holds $nT rows for $expectedDel requests — " +
          "a replayed batch double-recorded (exactly-once broken)")
      val out = docs.select(col("doc_id"), md5(col("text")).as("fp"))
        .join(tomb, Seq("doc_id"), "left_anti")
        .orderBy("doc_id").localCheckpoint(true)
      Seq(ckpt, store).foreach(p => rmTree(new java.io.File(p)))
      out
    }),

    // STREAMING ERASURE OF A SHARED SET ARTIFACT (round 16 — the
    // suffix dual of st_forget): a SET index cannot tombstone rows,
    // because an entry is co-owned by MANY docs and must leave only
    // when its LAST owner is erased — the reason pipe_forget's batch
    // leg REBUILDS the gram index over survivors. The streaming
    // answer is the LSM refcount: the served base segment stores
    // (prefix, gram fingerprint) → n_owners over the static slice;
    // each erasure micro-batch appends a DECREMENT segment (one −1
    // per (deleted doc, distinct gram), written BY BATCH ID —
    // idempotent overwrite, the established exactly-once contract);
    // the served view is base ∪ decrements, grouped per fingerprint,
    // HAVING Σ > 0. Per batch the work is the DELETED DOCS' chars —
    // never a corpus rebuild; base-vs-decrement compaction is the
    // pipe_forget republish, the two faces of one artifact. Crash
    // injects in batch 1 after the decrement write, before the commit
    // log; replay overwrites the same segment identically, and the
    // require pins the decrement log to exactly one row per
    // (doc, gram) — INFLATION is the SET-artifact failure mode
    // (double decrements would over-delete grams co-owned by
    // survivors). Output: the post-erasure index census per prefix
    // (the dd_suffix_index_build shape) from the served view; oracle
    // = distinct grams of the static survivors, stated from the raw
    // corpus.
    "st_suffix_forget" -> ((s, dir) => {
      import graft.operators.Dedup
      val spanL = Dedup.SuffixSpanL
      val docs = Tables.documents(s, dir)
      val static = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      // per-doc distinct grams, fingerprinted: the ownership unit the
      // refcount counts (a doc repeating a gram internally still owns
      // it once)
      def docGrams(d: DataFrame) = Dedup.suffixGramsOf(d, spanL)
        .select(col("doc_id"), col("g")).distinct()
        .select(Seq(col("doc_id"), substring(col("g"), 1, 1).as("c")) ++
          Dedup.gramFp(col("g")): _*)
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/suffix_forget_ckpt_$run"
      val store = s"${stageRoot(dir)}/suffix_forget_store_$run"
      // served base refcount segment — publish-ONCE per (session, dir)
      // like every served index (the st_incremental_dedup
      // corpusFp/corpusBnd rule and the pipe_forget/persistedIvfIndex
      // publish idiom): the base segment is the artifact a serving
      // tier holds BEFORE any erasure stream connects, so rebuilding
      // the full static-corpus refcount census per execution priced a
      // corpus-sized index build into every erasure run (round-17
      // optimization; the decrement segments stay run-scoped). The
      // root carries the session UUID so two concurrent JVMs over the
      // same testdata can't race overwrite-vs-read (round-15 advice).
      val baseRoot = graft.CacheRegistry.cached[String](
        servedCache, s, dir, "suffixRefcountBase") {
        val r = s"${stageRoot(dir)}/suffix_forget_base_" +
          org.apache.spark.sql.graftbridge.Bridge.sessionUUID(s).take(8)
        docGrams(static)
          .groupBy("c", "fp1", "fp2").agg(count(lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(r)
        r
      }
      val base = s.read.parquet(baseRoot)
      val delReq = static.filter(col("doc_id") % 97 === 13).select("doc_id")
      // inflation pin denominator: exactly one decrement per
      // (deleted doc, owned gram)
      val expectedDecs = docGrams(static.join(broadcast(delReq), "doc_id"))
        .count()
      val staged = stage(delReq.repartitionByRange(4, col("doc_id")),
        s"$dir/documents.parquet", s"${stageRoot(dir)}/suffix_forget_req")
      val parts = Option(new java.io.File(staged).listFiles()).toSeq
        .flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      val nFiles = parts.length
      require(nFiles >= 2,
        s"staged $nFiles parquet files — the batch-1 crash injection " +
          "needs at least 2 one-file micro-batches")
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      def start(injectCrash: Boolean) = s.readStream.schema(delReq.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          batchesSeen.incrementAndGet()
          val s2 = df.sparkSession
          // the batch's deleted docs' grams — batch-sized work: one
          // broadcast semi of the corpus down to the batch docs, one
          // gram explode of THOSE docs only
          docGrams(Tables.documents(s2, dir)
              .filter(pmod(col("doc_id"), lit(10)) =!= 7)
              .join(broadcast(df.select("doc_id")), "doc_id"))
            .select(col("c"), col("fp1"), col("fp2"), lit(-1L).as("n"))
            .write.mode(SaveMode.Overwrite).parquet(s"$store/dec/b$batchId")
          if (injectCrash && batchId == 1L) {
            crashed.set(true)
            throw new IllegalStateException(
              "injected crash: after decrement write, before commit-log entry")
          }
        }
        .start()
      val q1 = start(injectCrash = true)
      try { q1.processAllAvailable(); () }
      catch { case _: Exception => () } finally q1.stop()
      require(crashed.get(), "crash injection never fired — staged file " +
        "count changed? the recovery contract was not exercised")
      val q2 = start(injectCrash = false)
      try q2.processAllAvailable() finally q2.stop()
      require(batchesSeen.get() >= nFiles + 1L,
        s"expected batch 1 to REPLAY after restart, saw only " +
          s"${batchesSeen.get()} foreachBatch calls for $nFiles files")
      val decs = s.read.parquet(s"$store/dec/b*").localCheckpoint(true)
      val nDecs = decs.count()
      require(nDecs == expectedDecs,
        s"decrement log holds $nDecs rows for $expectedDecs " +
          "(doc, gram) pairs — a replayed batch double-decremented " +
          "(over-deletion of co-owned grams)")
      val out = base.unionByName(decs)
        .groupBy("c", "fp1", "fp2").agg(sum(col("n")).as("owners"))
        .filter(col("owners") > 0)
        .groupBy("c").agg(count(lit(1)).as("n_grams"))
        .orderBy("c").localCheckpoint(true)
      Seq(ckpt, store).foreach(p => rmTree(new java.io.File(p)))
      out
    }),

    "st_late_drop" -> ((s, dir) => {
            val ev = Tables.events(s, dir)
      val staged = s"${stageRoot(dir)}/ev_late_drop"
      if (isStale(staged, s"$dir/events.parquet")) {
        // boundary leg materialized ONCE (1 row) — both filtered
        // writes reuse it instead of re-running the min(ts) aggregate
        val bound = ev
          .agg((min(col("ts")) + expr("INTERVAL 100 HOURS")).as("b"))
          .localCheckpoint(false)
        val withB = ev.crossJoin(broadcast(bound))
        val dirF = new java.io.File(staged)
        if (dirF.exists()) dirF.listFiles().foreach(f => { f.delete(); () })
        dirF.mkdirs()
        val tmpOn = java.nio.file.Files.createTempDirectory("late_on")
        val tmpLate = java.nio.file.Files.createTempDirectory("late_l")
        withB.filter(col("ts") >= col("b")).drop("b")
          .repartitionByRange(4, col("ts"))
          .write.mode(SaveMode.Overwrite).parquet(tmpOn.toString)
        withB.filter(col("ts") < col("b")).drop("b")
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmpLate.toString)
        // flat dir, name + mtime pinned: on-time parts oldest-first,
        // the early file named AND stamped last; the temp write dirs
        // (and their _SUCCESS/.crc sidecars) are deleted after the
        // move so staging rebuilds don't accumulate orphans
        def moveParts(from: java.nio.file.Path, prefix: String,
            mt0: Long): Unit = {
          val fromF = new java.io.File(from.toString)
          fromF.listFiles()
            .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
            .zipWithIndex.foreach { case (f, i) =>
              val to = new java.io.File(staged, f"$prefix$i%02d.parquet")
              java.nio.file.Files.move(f.toPath, to.toPath)
              to.setLastModified(mt0 + i * 60000L); ()
            }
          fromF.listFiles().foreach(f => { f.delete(); () })
          fromF.delete(); ()
        }
        moveParts(tmpOn, "a_ontime_", 1700000000000L)
        moveParts(tmpLate, "z_late_", 1700000000000L + 6000000L)
        java.nio.file.Files.write(
          new java.io.File(staged, "_SUCCESS").toPath, Array.emptyByteArray)
        ()
      }
      val run = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = s"${stageRoot(dir)}/latedrop_ckpt_$run"
      val store = s"${stageRoot(dir)}/latedrop_store_$run"
      val q = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Agg.dsum(col("value")).as("sum_value"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          df.select(col("window").getField("start").as("hour"),
              col("event_type"), col("n_events"), col("sum_value"))
            .withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Overwrite).parquet(s"$store/b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val dropped = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsDroppedByWatermark).sum
      require(dropped > 0L,
        "no row was ever dropped by the watermark — the late staging " +
          "never exercised the drop path, the control is void")
      latestByBatch(s, store)
    })
  )

  // The batch duals' SQL verbatim — THAT is the contract.
  val oracleSql: Map[String, String] = Map(
    // batch dual of the streaming admission (first-occurrence
    // self-dedup in doc_id order = stream arrival order)
    "st_incremental_dedup" -> graft.operators.Dedup.incrementalAdmissionSql,
    // batch dual of the streaming IVF admission (per-vector argmin
    // against the trained centroids — order-free, so stream batching
    // cannot change it)
    "st_ivf_admit" -> graft.operators.Similarity.streamAdmitSql,
    // batch dual of the streaming exact-substring admission: a delta
    // doc's position is matched iff its 32-gram appears in the static
    // corpus or in an earlier-admitted delta doc (batch order =
    // doc_id order, so "earlier" is doc_id < — order-free SQL);
    // matched positions merge to maximal spans per doc
    "st_suffix_admit" -> {
      val l = graft.operators.Dedup.SuffixSpanL
      s"""WITH del AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents
         |  WHERE doc_id % 10 = 7),
         |sidx AS MATERIALIZED (
         |  SELECT DISTINCT substring(text, CAST(p AS INT), $l) AS g
         |  FROM (SELECT text, length(text) AS len FROM documents
         |        WHERE doc_id % 10 <> 7),
         |       UNNEST(range(1, len - ${l - 2})) AS u(p)),
         |dg AS MATERIALIZED (
         |  SELECT doc_id, CAST(p AS INT) AS p,
         |    substring(text, CAST(p AS INT), $l) AS g
         |  FROM del, UNNEST(range(1, len - ${l - 2})) AS u(p)),
         |hit AS (
         |  SELECT DISTINCT d.doc_id, d.p FROM dg d
         |  WHERE EXISTS (SELECT 1 FROM sidx s WHERE s.g = d.g)
         |     OR EXISTS (SELECT 1 FROM dg d2
         |                WHERE d2.g = d.g AND d2.doc_id < d.doc_id)),
         |isl AS (
         |  SELECT doc_id, p,
         |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
         |  FROM hit)
         |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
         |  CAST(max(p) - min(p) + $l AS BIGINT) AS span_len
         |FROM isl GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin
    },
    // the batch dual of streaming erasure: the surviving fingerprint
    // index once every tombstone has been applied
    "st_forget" ->
      """SELECT doc_id, md5(text) AS fp FROM documents
        |WHERE doc_id % 97 <> 13 ORDER BY doc_id""".stripMargin,
    // the refcounted SET-erasure dual: once every decrement has been
    // applied, the served gram index is exactly the distinct grams of
    // the static survivors — stated per first-char prefix from the
    // raw corpus (the dd_suffix_index_build census shape)
    "st_suffix_forget" -> {
      val l = graft.operators.Dedup.SuffixSpanL
      s"""WITH sga AS (
         |  SELECT DISTINCT substring(text, CAST(p AS INT), $l) AS g
         |  FROM (SELECT text, length(text) AS len FROM documents
         |        WHERE doc_id % 10 <> 7 AND doc_id % 97 <> 13),
         |       UNNEST(range(1, len - ${l - 2})) AS u(p))
         |SELECT substring(g, 1, 1) AS c, count(*)::BIGINT AS n_grams
         |FROM sga GROUP BY 1 ORDER BY c""".stripMargin
    },
    "st_new_users" ->
      """SELECT CAST(fd AS VARCHAR) AS day, count(*)::BIGINT AS new_users
        |FROM (SELECT user_id, min(CAST(ts AS DATE)) AS fd
        |      FROM events GROUP BY 1)
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "st_tumbling_hour" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  count(*) AS n_events,
         |  ${OracleSql.dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // The exactly-once contract: the crash-replay-merged store equals
    // the batch aggregate verbatim (same SQL as st_tumbling_hour).
    "st_restart_upsert" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  count(*) AS n_events,
         |  ${OracleSql.dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // the negative control: ONLY the on-time side of the boundary
    // counts — the early quartile arrives behind the watermark and
    // must be dropped, so the contract is the filtered batch aggregate
    "st_late_drop" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  count(*) AS n_events,
         |  ${OracleSql.dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= (SELECT min(ts) + INTERVAL 100 HOURS FROM events)
         |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // replay + eviction compose: time-ordered staging means eviction
    // never drops a row, so the batch aggregate is again the contract
    "st_restart_watermark" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  count(*) AS n_events,
         |  ${OracleSql.dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "st_topk_window" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS hour, user_id,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT hour, user_id, n_events,
        |    CAST(row_number() OVER (PARTITION BY hour
        |      ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rank
        |  FROM c)
        |SELECT hour, user_id, n_events, rank
        |FROM r WHERE rank <= 3 ORDER BY hour, rank""".stripMargin,
    "st_sliding_15m" ->
      s"""SELECT time_bucket(INTERVAL '5 minutes', ts)
         |         - k * INTERVAL '5 minutes' AS win_start,
         |  count(*) AS n_events,
         |  ${OracleSql.dsum("value")} AS sum_value
         |FROM events, UNNEST([0, 1, 2]) AS u(k)
         |GROUP BY 1 ORDER BY win_start""".stripMargin,
    "st_click_after_view" ->
      """SELECT v.event_id AS view_id, c.event_id AS click_id,
        |  v.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        | AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTES
        |ORDER BY view_id, click_id""".stripMargin,
    // the batch LEFT JOIN verbatim — unmatched views carry NULL
    // click_id, exactly what the watermark finalizes streaming-side
    "st_view_conversion" ->
      """SELECT v.event_id AS view_id, v.user_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        | AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTES
        |ORDER BY view_id, click_id NULLS FIRST""".stripMargin,
    "st_dedup_exact" ->
      "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp",
    "st_enrich_join" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        |  FROM events GROUP BY user_id)
        |SELECT c.cohort_day, e.event_type, count(*) AS n_events
        |FROM events e JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, event_type""".stripMargin,
    "st_hll_registers" ->
      graft.operators.SketchQueries.oracleSql("sk_hll_registers"),
    // The batch session-window derivation (lag → island ids) verbatim.
    "st_session_window" ->
      graft.operators.EventQueries.oracleSql("ev_session_window"),
    "st_domain_cap" ->
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= ${graft.operators.QualityQueries.DomainCap}
         |ORDER BY source, doc_id""".stripMargin
  )
}

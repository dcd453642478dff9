package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's Parquet testdata (TESTDATA.md).
  *
  * At 100 TB these reads become distributed parquet scans; everything
  * downstream relies on Catalyst pushing filters/projections into the
  * scan (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  // Memoized per (sessionUUID, path): re-reading a table otherwise
  // re-lists the directory and re-reads parquet footers on every
  // query — pure overhead when a bench/verify session touches each
  // table dozens of times. The cached object is just the resolved
  // DataFrame handle (plan + file index), not materialized data.
  // Caveats (by design, for these short-lived driver sessions): the
  // handle serves a STALE file listing if the path's files are
  // rewritten — writers must call invalidate(path) — and entries for a
  // stopped session linger until invalidateSession; keying by the UUID
  // string (not the session object) at least keeps the key itself from
  // pinning anything.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  // sessionUUID lives on the classic session (the only runtime flavor
  // here) and is private[sql] — accessed via the bridge
  private def uuidOf(spark: SparkSession): String =
    org.apache.spark.sql.graftbridge.Bridge.sessionUUID(spark)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((uuidOf(spark), s"$dir/$name.parquet"),
      key => spark.read.parquet(key._2))

  /** Drop every cached handle under `pathPrefix` (all sessions). Call
    * after rewriting parquet files in place, or the cached file index
    * serves deleted/stale files.
    */
  def invalidate(pathPrefix: String): Unit = {
    cache.keySet.removeIf(_._2.startsWith(pathPrefix))
    // derived artifacts (verified dedup pairs, trained codebooks)
    // built from tables under the prefix go stale with them
    CacheRegistry.invalidate(pathPrefix)
  }

  /** Drop a session's cached handles (call when done with a session so
    * its resolved file indexes are not pinned for the JVM lifetime).
    */
  def invalidateSession(spark: SparkSession): Unit = {
    cache.keySet.removeIf(_._1 == uuidOf(spark))
    CacheRegistry.invalidateSession(spark)
  }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations, and this loader normalizes both to a session-zone
    * `TIMESTAMP` so every downstream query sees one schema:
    *
    *  - parquet TIMESTAMP(NANOS) (older drops): Spark 4 refuses it by
    *    default, so read the nanos as long (`nanosAsLong`) and convert
    *    with exact integral division (`div` — a double division would
    *    lose precision above 2^53 ns). Truncation toward zero matches
    *    DuckDB's own ns→µs narrowing, so oracle comparisons stay exact.
    *  - parquet timestamp[us] without UTC adjustment (current drops):
    *    Spark infers TIMESTAMP_NTZ; cast it to TIMESTAMP. Every graft
    *    session pins `spark.sql.session.timeZone=UTC`, so the cast
    *    preserves wall-clock values bit-for-bit and DuckDB (whose
    *    TIMESTAMP is NTZ µs) reads identical values.
    *
    * SESSION-WIDE SIDE EFFECT (documented, deliberate): nanosAsLong has
    * no per-read DataSource option (verified against Spark 4.1's
    * ParquetOptions — only rebase/compression/mergeSchema exist), so
    * this sets `spark.sql.legacy.parquet.nanosAsLong` on the session,
    * changing how EVERY later nanos-parquet read in the session infers
    * its schema (they get a LongType instead of an AnalysisException).
    * All graft callers (Graft.openViews, Stress, the query maps) want
    * exactly that; an embedding application that doesn't should scope
    * its reads with `spark.newSession()`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as nanos-long
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // timestamp[us], isAdjustedToUTC=false
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType =>
        raw // already a session-zone TIMESTAMP
      case other =>
        // fail loudly: a new testdata physical layout must be handled
        // HERE, not flow downstream unnormalized as subtle divergence
        throw new IllegalStateException(
          s"events.ts has unrecognized physical type $other — " +
            "add an explicit normalization branch in Tables.events")
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}

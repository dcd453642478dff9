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
  // Memoized per (session, path): re-reading a table otherwise re-lists
  // the directory and re-reads parquet footers on every query — pure
  // overhead when a bench/verify session touches each table dozens of
  // times. The cached object is just the resolved DataFrame handle
  // (plan + file index), not materialized data.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read nanos as long and convert to a microsecond timestamp
    * with exact integral division (`div` — a double division would lose
    * precision above 2^53 ns). Truncation toward zero matches DuckDB's
    * own ns→µs narrowing, so oracle comparisons stay exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}

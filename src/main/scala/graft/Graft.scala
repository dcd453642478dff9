package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing convenience surface: register every testdata table as a
  * temp view (documents/embeddings get their typed/normalized forms)
  * and run arbitrary SQL against them — the "switch your engine, keep
  * your SQL" entry point.
  */
object Graft {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  def openViews(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))
    Tables.events(spark, dir).createOrReplaceTempView("events") // ns→µs normalized
  }

  /** Register views + graft SQL functions, then run the query. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    openViews(spark, dir)
    GraftExtensions.register(spark)
    spark.sql(query)
  }
}

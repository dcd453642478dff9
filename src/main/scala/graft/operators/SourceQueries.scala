package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Source-format coverage beyond parquet: CSV and JSON read paths,
  * oracle-checked end-to-end. Each query round-trips a small dimension
  * table through the format (write with the session, read back with the
  * ORIGINAL schema — no inference drift) and returns the rows, so the
  * oracle is simply the source table. ORC and partitioned-parquet
  * round-trips are covered in `ScaleSpec`; the text-file source is the
  * wordcount family's `LineFile`.
  *
  * Scale note: both readers are splittable scans with column pruning
  * (CSV prunes after parse; JSON uses the schema to skip unused
  * fields); at 100 TB the guidance stands — land raw CSV/JSON once,
  * rewrite to parquet, and let every downstream query read columnar.
  * These queries pin the ingestion leg of that story.
  */
object SourceQueries {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_src/$name"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CSV: header + quoted commas (n_comment contains free text).
    "src_csv_roundtrip" -> ((s, dir) => {
      val base = Tables.nation(s, dir)
      val path = tmp("nation_csv")
      base.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      s.read.schema(base.schema).option("header", "true").csv(path)
        .orderBy("n_nationkey")
    }),

    // JSON lines: schema passed explicitly (inference would widen
    // integer types and reorder fields).
    "src_json_roundtrip" -> ((s, dir) => {
      val base = Tables.region(s, dir)
      val path = tmp("region_json")
      base.write.mode(SaveMode.Overwrite).json(path)
      s.read.schema(base.schema).json(path)
        .orderBy("r_regionkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "src_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "src_json_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey"
  )
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Reference-faithful line-oriented text source (O1, `Worker.cc:123-141`):
  * record = (1-based global line number, line text).
  *
  * `spark.read.text` gives the distributed scan; the stable global line
  * number comes from `zipWithIndex` (partition-ordered, deterministic for
  * a single file). The reference's "chunk" (= `chunk_size` consecutive
  * lines, `Worker.cc:128-137`) maps to an input split; its bounded read
  * (spec §6: only `num_chunks × chunk_size` lines participate) is the
  * `maxLines` filter.
  *
  * Scale note: `zipWithIndex` runs one lightweight count job over
  * partition sizes before the main job — acceptable, and the only way to
  * get gap-free global line numbers distributively. When line numbers
  * don't need to be gap-free, `monotonically_increasing_id` is the
  * zero-extra-job alternative.
  */
object LineFile {
  def read(spark: SparkSession, path: String, maxLines: Option[Long] = None): DataFrame = {
    val lines = spark.read.textFile(path).rdd.zipWithIndex().map {
      case (text, idx) => Row(idx + 1L, text) // 1-based, like the reference (W5)
    }
    val schema = StructType(Seq(
      StructField("line_no", LongType, nullable = false),
      StructField("text", StringType, nullable = true)
    ))
    val df = spark.createDataFrame(lines, schema)
    maxLines.fold(df)(n => df.filter(df("line_no") <= n))
  }
}

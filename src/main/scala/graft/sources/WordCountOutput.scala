package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.MapReducePipeline

/** Reference-format output sink (O8, `Worker.cc:267-274`): one text
  * file per reduce task containing `word count\n` lines, sorted within
  * the task (W4 — sort scope is per reduce task, never global).
  *
  * Spark mapping: repartition by the reference partitioner's bucket
  * column (O3) so each task holds exactly one reducer's data, sort
  * within partitions, and write `partitionBy("bucket")` — yielding
  * `bucket=K/part-*.txt` per reducer, the analog of `<job>-<K+1>.out`.
  * At any scale each output task streams one sorted bucket — identical
  * to the reference's reducer loop, minus its single-node ceiling.
  */
object WordCountOutput {

  /** Write (word, cnt) with a bucket column as reference-style
    * per-reducer sorted text files under `outDir`.
    */
  def write(counts: DataFrame, numReducers: Int, outDir: String): Unit = {
    counts
      .withColumn("bucket", MapReducePipeline.bucketOf(col("word"), numReducers))
      .repartition(numReducers, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("word"))
      .select(col("bucket"), concat_ws(" ", col("word"), col("cnt")).as("value"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .text(outDir)
  }
}

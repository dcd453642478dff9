package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native re-expression of the reference's MapReduce pipeline.
  *
  * The reference (`Worker.cc:123-274` in
  * xxxandreaa/MapReduce_Implementation) hard-codes WordCount through
  * seven pluggable user functions: `Input_split` (`Worker.cc:123-141`)
  * → `Map` (`Worker.cc:143-162`) → `Partition` (`Worker.cc:164-172`) →
  * shuffle → `Sort` (`Worker.cc:212-232`) → `Group` (`Worker.cc:235-252`)
  * → `Reduce` (`Worker.cc:254-264`) → `Output` (`Worker.cc:267-274`).
  * The course (spec §8) grades swapping sort direction, grouping
  * comparator, and partitioner — so this pipeline is *parameterized*, not
  * hard-coded: each of the seven functions maps to a constructor knob
  * that stays a pure Catalyst expression (codegen-friendly, no UDFs).
  *
  * Deliberate semantic choices for the reference's undefined corners
  * (SURVEY.md §2 W1-W5):
  *  - W1: empty tokens are filtered (the reference is UB on them);
  *  - W2: bucket assignment uses `pmod` (non-negative), equal to the
  *    reference's `(word[0]-'A') % R` on `[A-Za-z]`-led words;
  *  - W3: the bounded read (`num_chunks × chunk_size` lines) is an
  *    optional predicate on the record key — pushed down to the scan;
  *  - W4: sorting is per reduce task; we express it as a global
  *    (bucket, word) order, which concatenates per-task sorted files
  *    in task order — byte-identical to the reference's output set.
  *
  * Scale: `Map` is a narrow `explode`; the only shuffle is the
  * aggregation exchange, and Catalyst inserts a partial (map-side)
  * HashAggregate before it — asymptotically less shuffle I/O than the
  * reference, which ships every `(word, 1)` pair raw (it has no
  * combiner; `Worker.cc:143-162`). At 100 TB the shuffle volume is
  * O(distinct words), not O(tokens).
  */
final case class MapReduceJob(
    /** column holding the record text (the reference's line text) */
    textCol: String = "text",
    /** column holding the record key (the reference's 1-based line number) */
    keyCol: String = "doc_id",
    /** O2 `Map`: text → array of tokens (reference splits on single space) */
    tokenize: Column => Column = c => split(c, " ", -1),
    /** O6 `Group`: token → grouping key (spec §8 variant: first character) */
    groupKey: Column => Column = identity,
    /** O5 `Sort`: ASCII ascending by default; spec §8 variant: descending */
    sortAscending: Boolean = true,
    /** O3 `Partition`: when set, emit the reducer bucket column
      * `pmod(first_char - 'A', numReducers)` (reference `Worker.cc:167`) */
    numReducers: Option[Int] = None,
    /** W3 bounded read: only records with key < maxRecords participate
      * (the reference reads only `num_chunks × chunk_size` lines) */
    maxRecords: Option[Long] = None
)

object MapReducePipeline {

  /** O1+O2+W1: bounded scan, tokenize, drop empty tokens.
    * The W3 bound is a plain predicate on the key column so Catalyst
    * pushes it into the parquet scan.
    */
  def tokens(records: DataFrame, job: MapReduceJob): DataFrame = {
    val bounded = job.maxRecords.fold(records)(n => records.filter(col(job.keyCol) < n))
    bounded
      .select(explode(job.tokenize(col(job.textCol))).as("word"))
      .filter(length(col("word")) > 0)
  }

  /** Reference partitioner (`Worker.cc:167`), W2-cleaned: bucket =
    * pmod(ascii(word[0]) - 'A', numReducers). Which bucket a word lands
    * in only affects output placement, never counts.
    */
  def bucketOf(word: Column, numReducers: Int): Column =
    pmod(ascii(substring(word, 1, 1)) - lit(65), lit(numReducers))

  /** Full pipeline O1→O8: returns the reference's output relation
    * (word, cnt[, bucket]) in its output order.
    */
  def run(records: DataFrame, job: MapReduceJob): DataFrame = {
    val keyed   = tokens(records, job).select(job.groupKey(col("word")).as("word"))
    val counted = keyed.groupBy("word").agg(count(lit(1)).as("cnt"))
    val sortDir: Column => Column = if (job.sortAscending) _.asc else _.desc
    job.numReducers match {
      case None => counted.orderBy(sortDir(col("word")))
      case Some(r) =>
        // W4: reference sorts per reduce task; (bucket asc, word) order
        // is the concatenation of per-task sorted outputs in task order.
        counted
          .withColumn("bucket", bucketOf(col("word"), r))
          .orderBy(col("bucket").asc, sortDir(col("word")))
    }
  }

  /** O12 global intermediate-KV count (`Worker.cc:94-99`,
    * `Scheduler.cc:134-139`): the reference MPI_Reduce-sums per-worker
    * intermediate pair counts and logs them at Start_Shuffle. Spark
    * analog: count the exploded token frame (a distributed count; the
    * reference's number equals ours because it also has no combiner
    * before this point).
    */
  def intermediatePairCount(records: DataFrame, job: MapReduceJob): Long =
    tokens(records, job).count()

  /** Per-record term frequency — the pre-Reduce view of the pipeline
    * keyed by the reference's record key (line number ≈ doc_id).
    */
  def termFrequency(records: DataFrame, job: MapReduceJob): DataFrame = {
    val bounded = job.maxRecords.fold(records)(n => records.filter(col(job.keyCol) < n))
    bounded
      .select(col(job.keyCol), explode(job.tokenize(col(job.textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(job.keyCol), col("word"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col(job.keyCol).asc, col("word").asc)
  }
}

package graft.sources

import org.apache.spark.{Partition, SparkContext, TaskContext}
import org.apache.spark.rdd.RDD

/** O14 locality-config scan + O9 locality-aware dispatch, Spark-first.
  *
  * The reference scheduler reads a locality config of `"<chunk> <node>"`
  * lines (`Scheduler.cc:90-99`), wrapping node ids above the worker
  * count via modulo (`Scheduler.cc:93-95`), then its dispatch threads
  * prefer sending each chunk to its configured node (O9). Spark's
  * native carrier for exactly this information is
  * `RDD.getPreferredLocations`: the DAGScheduler's delay scheduling
  * consumes it and places tasks host-locally when slots allow — the
  * platform half the reference hand-rolls with pthreads.
  *
  * So the Spark-first re-expression is (a) the config scan with the
  * reference's wrap rule, and (b) an RDD whose partitions are the
  * chunks and whose preferred location is the configured node's host.
  * On a real cluster `hostOf` maps node ids to executor hostnames; the
  * demo cannot *assert* physical placement on local[n] (one host), but
  * the scheduler-visible surface — `SparkContext.getPreferredLocs` — is
  * tested.
  */
object LocalityFile {

  /** Parse `"<chunk> <node>"` lines with the reference's wrap rule:
    * node ids strictly above `numWorkers` wrap via modulo
    * (`Scheduler.cc:93-95`; workers are 1-based ranks, the scheduler is
    * rank 0). Malformed lines fail fast, like `std::stoi` would.
    */
  def parse(lines: IterableOnce[String], numWorkers: Int): Seq[(Int, Int)] =
    lines.iterator.filter(_.trim.nonEmpty).map { line =>
      val parts = line.trim.split("\\s+")
      require(parts.length >= 2, s"locality line needs '<chunk> <node>': $line")
      val chunk = parts(0).toInt
      val node0 = parts(1).toInt
      val node = if (node0 > numWorkers) node0 % numWorkers else node0
      (chunk, node)
    }.toSeq

  /** Chunk partitions carrying the configured preferred host. */
  private case class ChunkPartition(index: Int, chunkId: Int, host: String)
    extends Partition

  /** One partition per configured chunk; `getPreferredLocations` feeds
    * the chunk→node assignment to Spark's delay scheduler. `compute`
    * yields the (chunkId, nodeId-as-host) pair so tests and demos can
    * see the dispatch table the scheduler saw.
    */
  class LocalityAwareChunksRDD(
      sc: SparkContext,
      chunkToNode: Seq[(Int, Int)],
      hostOf: Int => String)
    extends RDD[(Int, String)](sc, Nil) {

    override def getPartitions: Array[Partition] =
      chunkToNode.zipWithIndex.map { case ((c, n), i) =>
        ChunkPartition(i, c, hostOf(n)): Partition
      }.toArray

    override def getPreferredLocations(split: Partition): Seq[String] =
      Seq(split.asInstanceOf[ChunkPartition].host)

    override def compute(split: Partition, ctx: TaskContext): Iterator[(Int, String)] = {
      val p = split.asInstanceOf[ChunkPartition]
      Iterator((p.chunkId, p.host))
    }
  }

  /** The reference's full O14 flow: config lines → chunk RDD whose
    * partitions prefer their configured node's host.
    */
  def chunksRDD(
      sc: SparkContext,
      configLines: IterableOnce[String],
      numWorkers: Int,
      hostOf: Int => String = n => s"worker-$n"): LocalityAwareChunksRDD =
    new LocalityAwareChunksRDD(sc, parse(configLines, numWorkers), hostOf)
}

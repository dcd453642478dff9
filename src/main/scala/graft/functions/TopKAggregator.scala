package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded top-k by (score desc, id asc) with an O(k)
  * buffer — the scale path for grouped top-k when per-group candidate
  * counts make window sorting expensive (SURVEY §7.3). The window +
  * `row_number` form materializes and sorts each partition's rows;
  * this keeps exactly k per partial aggregate and merges heaps, so a
  * 1000-candidate group costs O(n log k) and shuffles only k rows.
  *
  * Ordering matches the window queries: score descending, id ascending
  * on ties — fully deterministic.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Seq[(Long, Double)]] {

  // Orders "strongest first" ((score desc, id asc) = minimum), so the
  // max-heap's head (PriorityQueue dequeues the maximum) is the weakest
  // element — the eviction candidate.
  private val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  private def insert(
      b: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    if (b.size < k) b.enqueue(e)
    else if (ord.lt(e, b.head)) { b.dequeue(); b.enqueue(e) }
    b
  }

  override def reduce(
      b: mutable.PriorityQueue[(Double, Long)],
      a: (Long, Double)): mutable.PriorityQueue[(Double, Long)] =
    insert(b, (a._2, a._1))

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Long, Double)] =
    b.toSeq.sortBy { case (score, id) => (-score, id) }
      .map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

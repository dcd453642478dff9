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

/** String-keyed sibling of [[TopKAggregator]]: bounded top-k of
  * (term, count) by (count desc, term asc) with an O(k) buffer — the
  * grouped-top-k shape for vocabulary frames (bigram continuations),
  * where a window would sort one head word's whole successor set in a
  * task and a `collect_list` would buffer it. Partial aggregates keep
  * exactly k entries, so a Zipfian head word with 10⁸ distinct
  * successors shuffles k rows, not 10⁸.
  */
class TopKStringAggregator(k: Int)
    extends Aggregator[(String, Long), mutable.PriorityQueue[(Long, String)], Seq[(String, Long)]] {

  // "strongest first" = (count desc, term asc) minimal; the max-heap
  // head is the weakest entry — the eviction candidate.
  private val ord: Ordering[(Long, String)] =
    Ordering.Tuple2(Ordering[Long].reverse, Ordering[String])

  override def zero: mutable.PriorityQueue[(Long, String)] =
    mutable.PriorityQueue.empty[(Long, String)](ord)

  private def insert(
      b: mutable.PriorityQueue[(Long, String)],
      e: (Long, String)): mutable.PriorityQueue[(Long, String)] = {
    if (b.size < k) b.enqueue(e)
    else if (ord.lt(e, b.head)) { b.dequeue(); b.enqueue(e) }
    b
  }

  override def reduce(
      b: mutable.PriorityQueue[(Long, String)],
      a: (String, Long)): mutable.PriorityQueue[(Long, String)] =
    insert(b, (a._2, a._1))

  override def merge(
      b1: mutable.PriorityQueue[(Long, String)],
      b2: mutable.PriorityQueue[(Long, String)]): mutable.PriorityQueue[(Long, String)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def finish(b: mutable.PriorityQueue[(Long, String)]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (cnt, term) => (-cnt, term) }
      .map { case (cnt, term) => (term, cnt) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Long, String)]] =
    Encoders.kryo[mutable.PriorityQueue[(Long, String)]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.11(c) — typed top-k per group as an `Aggregator`: a
  * bounded min-heap per partition, merged heap-wise, so the shuffle
  * carries k elements per group per partition instead of every row.
  * The window-function route (`row_number` + filter, `q5_topk_window`)
  * sorts entire partitions; this one is O(n log k) and the right shape
  * when k ≪ group size — the 100 TB case.
  *
  * Usage: `ds.groupByKey(_.key).agg(new TopKAggregator(k).toColumn)`
  * over `(id, score)` pairs; ties break on the larger id to keep the
  * result deterministic.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Seq[Long]]
  with Serializable {

  // dequeue evicts the weakest: lowest score, then (on ties) highest id
  // — consistent with finish()'s (-score, id) ordering
  private def ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  override def reduce(
      heap: mutable.PriorityQueue[(Double, Long)],
      row: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
    heap.enqueue((row._2, row._1))
    while (heap.size > k) heap.dequeue(): Unit
    heap
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue(): Unit
    a
  }

  /** Ids of the top-k rows, best score first, ties broken by lower id. */
  override def finish(heap: mutable.PriorityQueue[(Double, Long)]): Seq[Long] =
    heap.toSeq.sortBy { case (s, id) => (-s, id) }.map(_._2)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.javaSerialization[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.11(c) — typed top-k per group as an `Aggregator`: a
  * bounded buffer per partition, merged pairwise, so the shuffle
  * carries k elements per group per partition instead of every row.
  * The window-function route (`row_number` + filter, `q5_topk_window`)
  * sorts entire partitions; this one is O(n·k) with k tiny and the
  * right shape when k ≪ group size — the 100 TB case.
  *
  * The buffer is a best-first-sorted `Seq[(Double, Long)]` of length
  * ≤ k, Tungsten-encoded (`ExpressionEncoder`) — an earlier version
  * used a `PriorityQueue` behind `Encoders.javaSerialization`, which
  * pushed every partial buffer through Java serialization on the
  * exchange and dominated the aggregate's runtime.
  *
  * Usage: typed — `ds.groupByKey(_.key).agg(new TopKAggregator(k)
  * .toColumn)`; relational — `functions.udaf(new TopKAggregator(k))`
  * and `df.groupBy(...).agg(topk(id, score))` (the plan Catalyst gives
  * this is an ObjectHashAggregate with map-side partials). Ties break
  * on the lower id, matching `row_number() ... ORDER BY score DESC,
  * id`.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]]
  with Serializable {

  // buffers are sorted best-first: (-score, id) ascending
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(
      buf: Seq[(Double, Long)],
      row: (Long, Double)): Seq[(Double, Long)] = {
    val e = (row._2, row._1)
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(better(e, _)) match {
        case -1 => buf.size
        case n  => n
      }
      (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def merge(
      a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
      n += 1
    }
    out.result()
  }

  /** Ids of the top-k rows, best score first, ties broken by lower id. */
  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** SURVEY §2.11(c) — typed top-k per group on the [[BoundedTopK]]
  * core: a bounded buffer per partition, merged pairwise, so the
  * shuffle carries k elements per group per partition instead of
  * every row. The window-function route (`row_number` + filter,
  * `q5_topk_window`) sorts entire partitions; this one is O(n·k) with
  * k tiny and the right shape when k ≪ group size — the 100 TB case.
  *
  * The buffer is a best-first-sorted `Seq[(Double, Long)]`,
  * Tungsten-encoded (`ExpressionEncoder`) — an earlier version used a
  * `PriorityQueue` behind `Encoders.javaSerialization`, which pushed
  * every partial buffer through Java serialization on the exchange
  * and dominated the aggregate's runtime.
  *
  * Usage: typed — `ds.groupByKey(_.key).agg(new TopKAggregator(k)
  * .toColumn)`; relational — `functions.udaf(new TopKAggregator(k))`
  * and `df.groupBy(...).agg(topk(id, score))` (the plan Catalyst gives
  * this is an ObjectHashAggregate with map-side partials). Ties break
  * on the lower id, matching `row_number() ... ORDER BY score DESC,
  * id`.
  */
class TopKAggregator(k: Int)
  extends BoundedTopK[(Long, Double), (Double, Long), Seq[Long]](k) {

  override protected def toBuf(in: (Long, Double)): (Double, Long) =
    (in._2, in._1)

  // best-first: (-score, id) ascending
  override protected def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Ids of the top-k rows, best score first, ties broken by lower id. */
  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

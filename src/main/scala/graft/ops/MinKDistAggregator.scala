package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** The ADC member of the [[BoundedTopK]] family: k NEAREST by an
  * integer distance (ascending, ties to the smaller id), keeping the
  * distance alongside the id — the bounded per-query heap a real
  * IVF-PQ scan carries, so the exchange ships k pairs per query per
  * partition instead of every same-cell candidate (the candidate
  * volume is Σ cell², which grows superlinearly under cell skew — the
  * s12 probe reads it directly when this aggregator is bypassed).
  *
  * Input (vec_id, dist2); output best-first `Seq[(dist2, vec_id)]` —
  * exactly `row_number() OVER (ORDER BY dist2, vec_id) <= k`.
  */
class MinKDistAggregator(k: Int)
  extends BoundedTopK[(Long, Long), (Long, Long), Seq[(Long, Long)]](k) {

  override protected def toBuf(in: (Long, Long)): (Long, Long) =
    (in._2, in._1)

  override protected def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** The three-key member of the [[BoundedTopK]] family: keeps the k
  * best `(term, tf, df)` rows per group under the keyword ranking
  * `tf desc, df asc (rarer first), term asc` — k1's exact window
  * ordering, without the window's corpus-scale sort of the doc×term
  * stream. ≤ k tuples per group per partition cross the wire
  * (ObjectHashAggregate via `udaf`).
  */
class KeywordTopKAggregator(k: Int)
  extends BoundedTopK[(String, Long, Long), (String, Long, Long), Seq[(String, Long, Long)]](k) {

  override protected def toBuf(in: (String, Long, Long)): (String, Long, Long) = in

  // best-first under (tf desc, df asc, term asc)
  override protected def better(a: (String, Long, Long), b: (String, Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 &&
      (a._3 < b._3 || (a._3 == b._3 && a._1 < b._1)))

  /** Best first; position in the list IS the rank - 1. */
  override def finish(buf: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}

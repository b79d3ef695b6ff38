package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** The scored-string member of the [[BoundedTopK]] family: keeps the
  * k best `(term, score)` rows per group under `score desc, term asc`
  * — k7's χ² ranking (and any score-a-string-per-group shape) without
  * a per-group window sort. ≤ k tuples per group per partition cross
  * the wire (ObjectHashAggregate via `udaf`). The score ties to the
  * term, a TOTAL order, so partial merges are deterministic.
  */
class ScoreTopKAggregator(k: Int)
  extends BoundedTopK[(String, Double), (Double, String), Seq[(String, Double)]](k) {

  override protected def toBuf(in: (String, Double)): (Double, String) =
    (in._2, in._1)

  // best-first: score desc, term asc
  override protected def better(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Best first; position in the list IS the rank - 1. */
  override def finish(buf: Seq[(Double, String)]): Seq[(String, Double)] =
    buf.map { case (score, term) => (term, score) }

  override def bufferEncoder: Encoder[Seq[(Double, String)]] =
    ExpressionEncoder[Seq[(Double, String)]]()

  override def outputEncoder: Encoder[Seq[(String, Double)]] =
    ExpressionEncoder[Seq[(String, Double)]]()
}

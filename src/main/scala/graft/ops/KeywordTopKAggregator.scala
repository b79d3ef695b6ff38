package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The three-key flavour of the bounded top-k family
  * ([[TopKAggregator]], [[MinKStrAggregator]]): keeps the k best
  * `(term, tf, df)` rows per group under the keyword ranking
  * `tf desc, df asc (rarer first), term asc` — k1's exact window
  * ordering, without the window's corpus-scale sort of the doc×term
  * stream. ≤ k tuples per group per partition cross the wire
  * (ObjectHashAggregate via `udaf`).
  */
class KeywordTopKAggregator(k: Int)
  extends Aggregator[(String, Long, Long), Seq[(String, Long, Long)], Seq[(String, Long, Long)]]
  with Serializable {

  // buffers sorted best-first under (tf desc, df asc, term asc)
  private def better(a: (String, Long, Long), b: (String, Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 &&
      (a._3 < b._3 || (a._3 == b._3 && a._1 < b._1)))

  override def zero: Seq[(String, Long, Long)] = Vector.empty

  override def reduce(
      buf: Seq[(String, Long, Long)],
      row: (String, Long, Long)): Seq[(String, Long, Long)] = {
    if (buf.size >= k && !better(row, buf.last)) buf
    else {
      val i = buf.indexWhere(better(row, _)) match {
        case -1 => buf.size
        case n  => n
      }
      (buf.take(i) :+ row) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def merge(
      a: Seq[(String, Long, Long)],
      b: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
    val out = Vector.newBuilder[(String, Long, Long)]
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

  /** Best first; position in the list IS the rank - 1. */
  override def finish(buf: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}

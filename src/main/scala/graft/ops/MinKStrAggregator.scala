package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKAggregator]]'s sibling for string-valued items ranked by an
  * ascending long key: keeps the k smallest `(rank, value)` pairs per
  * group (ties on the lexicographically smaller value), shipping ≤ k
  * elements per group per partition instead of sorting whole groups.
  *
  * Built for d13's rarity prefix — "the 2 globally-rarest shingles of
  * each document" — where the window-function route shuffles and
  * sorts the entire doc×shingle stream just to keep 2 rows per doc.
  * At 100 TB the stream is corpus-scale; the bounded buffer is the
  * only shape that doesn't pay a corpus-scale sort. Same
  * ObjectHashAggregate/udaf path as TopKAggregator, same reason.
  */
class MinKStrAggregator(k: Int)
  extends Aggregator[(Long, String), Seq[(Long, String)], Seq[String]]
  with Serializable {

  // buffers sorted best-first: (rank, value) ascending
  private def better(a: (Long, String), b: (Long, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, String)] = Vector.empty

  override def reduce(
      buf: Seq[(Long, String)],
      row: (Long, String)): Seq[(Long, String)] = {
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
      a: Seq[(Long, String)],
      b: Seq[(Long, String)]): Seq[(Long, String)] = {
    val out = Vector.newBuilder[(Long, String)]
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

  /** The k best values, best first. */
  override def finish(buf: Seq[(Long, String)]): Seq[String] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, String)]] =
    ExpressionEncoder[Seq[(Long, String)]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** [[TopKAggregator]]'s sibling on the [[BoundedTopK]] core for
  * string-valued items ranked by an ascending long key: keeps the k
  * smallest `(rank, value)` pairs per group (ties on the
  * lexicographically smaller value).
  *
  * Built for d13's rarity prefix — "the 2 globally-rarest shingles of
  * each document" — where the window-function route shuffles and
  * sorts the entire doc×shingle stream just to keep 2 rows per doc.
  * At 100 TB the stream is corpus-scale; the bounded buffer is the
  * only shape that doesn't pay a corpus-scale sort. Same
  * ObjectHashAggregate/udaf path as TopKAggregator, same reason.
  */
class MinKStrAggregator(k: Int)
  extends BoundedTopK[(Long, String), (Long, String), Seq[String]](k) {

  override protected def toBuf(in: (Long, String)): (Long, String) = in

  // best-first: (rank, value) ascending
  override protected def better(a: (Long, String), b: (Long, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** The k best values, best first. */
  override def finish(buf: Seq[(Long, String)]): Seq[String] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, String)]] =
    ExpressionEncoder[Seq[(Long, String)]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

package graft.ops

import org.apache.spark.sql.expressions.Aggregator

/** Shared core of the bounded top-k aggregator family
  * ([[TopKAggregator]], [[MinKStrAggregator]],
  * [[KeywordTopKAggregator]]): a best-first-sorted buffer of length
  * ≤ k, inserted into in place and merged pairwise, so each group
  * ships at most k elements per partition regardless of group size —
  * the whole point of the family vs window sorts.
  *
  * Subclasses supply the input→buffer projection, the ordering, the
  * finish projection, and the concrete Tungsten encoders
  * (`ExpressionEncoder` needs concrete element types, which is why the
  * base stays abstract instead of generic-with-TypeTags). The
  * insert/merge algorithm lives ONLY here.
  */
abstract class BoundedTopK[IN, BUF, OUT](k: Int)
  extends Aggregator[IN, Seq[BUF], OUT] with Serializable {

  /** Project an input row into a buffer element. */
  protected def toBuf(in: IN): BUF

  /** Strict "a ranks ahead of b" — a TOTAL order over possible
    * elements (break ties on a unique component) or merge order is
    * nondeterministic. */
  protected def better(a: BUF, b: BUF): Boolean

  final override def zero: Seq[BUF] = Vector.empty

  final override def reduce(buf: Seq[BUF], row: IN): Seq[BUF] = {
    val e = toBuf(row)
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(better(e, _)) match {
        case -1 => buf.size
        case n  => n
      }
      (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
    }
  }

  final override def merge(a: Seq[BUF], b: Seq[BUF]): Seq[BUF] = {
    val out = Vector.newBuilder[BUF]
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
}

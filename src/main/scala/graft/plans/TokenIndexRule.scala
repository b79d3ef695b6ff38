package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, ArrayContains, AttributeReference, EqualTo, Expression, Literal, StringSplit}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Registry of inverted-index tables (q40's structure) that
  * [[TokenIndexSubstitution]] may substitute into scans. The contract
  * a registrant asserts: the index at `indexPath` holds EXACTLY the
  * distinct `(docIdCol, termCol)` pairs of the registered corpus's
  * space-split tokens — i.e. it was built as
  * `docs.select(docId, explode(split(text, ' '))).distinct` — and is
  * refreshed whenever the corpus is republished (stale index = wrong
  * results, the same freshness contract every materialized view
  * carries).
  */
object IndexCatalog {
  final case class TokenIndex(indexPath: String, docIdCol: String,
                              termCol: String, textCol: String)

  private val reg = new ConcurrentHashMap[String, TokenIndex]()

  private def normalize(p: String): String = new Path(p).toUri.getPath

  def register(docsPath: String, idx: TokenIndex): Unit =
    reg.put(normalize(docsPath), idx): Unit
  def deregister(docsPath: String): Unit = reg.remove(normalize(docsPath)): Unit
  def clear(): Unit = reg.clear()
  def isEmpty: Boolean = reg.isEmpty
  def lookup(rootPaths: Seq[Path]): Option[TokenIndex] =
    rootPaths.flatMap(p => Option(reg.get(normalize(p.toString)))).headOption
      .filter(_ => rootPaths.nonEmpty)
}

/** Index-aware scan substitution — the materialized-view rewrite
  * Catalyst doesn't do on its own. A full-corpus token-membership scan
  *
  *   `docs.filter(array_contains(split(text, ' '), 'term'))`
  *
  * becomes, when an inverted index is registered for that corpus,
  *
  *   `docs LEFT SEMI JOIN (index WHERE term = 'term') ON doc_id`
  *
  * so the predicate answers from the index's pushdown-filtered
  * posting list instead of tokenizing every document: at 100 TB that
  * is the difference between a full scan + per-row split and reading
  * one term's postings (parquet stats prune the rest, especially
  * under the term-range-sorted layout `text/TokenStore` writes).
  *
  * Correctness: `array_contains(split(text,' '), t)` over a corpus is
  * definitionally the membership test the distinct (doc, term) index
  * materializes, so the semi-join returns the identical row set —
  * the spec pins equality against the unrewritten form. The rewrite
  * is idempotent (the matched conjunct is consumed) and leaves any
  * remaining conjuncts in place above the join.
  */
case class TokenIndexSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** array_contains(split(textCol, ' '), 'literal') → (attr, term) */
  private def tokenMembership(e: Expression): Option[(AttributeReference, String)] =
    e match {
      case ArrayContains(
            StringSplit(a: AttributeReference,
              Literal(sep: UTF8String, StringType), Literal(_, _)),
            Literal(term: UTF8String, StringType))
          if sep.toString == " " && !term.toString.contains(" ") =>
        Some((a, term.toString))
      case _ => None
    }

  private def baseRelation(plan: LogicalPlan): Option[LogicalRelation] =
    plan.collectLeaves() match {
      case Seq(lr @ LogicalRelation(_: HadoopFsRelation, _, _, _, _)) => Some(lr)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (IndexCatalog.isEmpty) return plan
    plan transformUp {
      case f @ Filter(cond, child) =>
        val rewritten = for {
          lr <- baseRelation(child)
          fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
          idx <- IndexCatalog.lookup(fsRel.location.rootPaths)
          conjuncts = splitConjuncts(cond)
          hit <- conjuncts.iterator.flatMap(c =>
            tokenMembership(c).map(m => (c, m))).buffered.headOption
          ((matched, (textAttr, term))) = hit
          // the matched attr must be the registered corpus's text col
          // and the doc-id col must still be in scope for the join
          if textAttr.name == idx.textCol
          docAttr <- child.output.collectFirst {
            case a: AttributeReference if a.name == idx.docIdCol => a
          }
        } yield {
          // the postings side composes with the file-grain zone map
          // (r12): an index published with a `_filemap` manifest (a
          // TokenStore tier version, or SortedLayout + ZoneMap.write)
          // is pruned to the ≤2 files whose term range can hold the
          // literal BEFORE any footer opens — one tiny driver-side
          // manifest read at plan time, full-scan fallback (with
          // parquet's own stats pruning) when no manifest covers the
          // term column. Either way the exact predicate still applies,
          // so the rewrite's row-set contract is untouched.
          val postings = graft.io.ZoneMap
            .scanForKeys(spark, idx.indexPath, idx.termCol, Seq(term))
            .where(col(idx.termCol) === term)
            .select(idx.docIdCol)
            .queryExecution.analyzed
          val join = Join(child, postings, LeftSemi,
            Some(EqualTo(docAttr, postings.output.head)), JoinHint.NONE)
          val rest = splitConjuncts(cond).filterNot(_ fastEquals matched)
          if (rest.isEmpty) join
          else Filter(rest.reduce(And), join)
        }
        rewritten.getOrElse(f)
    }
  }
}

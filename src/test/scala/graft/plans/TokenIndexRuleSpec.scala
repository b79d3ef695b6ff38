package graft.plans

import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The index-substitution rule end-to-end: a registered inverted index
  * turns a token-membership corpus scan into a posting-list semi-join
  * with IDENTICAL results; unregistered corpora and non-matching
  * predicates are untouched.
  */
class TokenIndexRuleSpec extends SparkSpec {

  private def docsPath = s"$sfDir/documents.parquet"

  private def tokenQuery = Tables.load(spark, sfDir, "documents")
    .filter(expr("array_contains(split(text, ' '), 'the')"))
    .select("doc_id", "n_chars")

  private def hasSemiJoin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j
    }.nonEmpty

  private def withIndex(body: String => Unit): Unit = {
    val idxPath = tmpDir("tokenidx") + "/idx"
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
      .write.parquet(idxPath)
    IndexCatalog.register(docsPath,
      IndexCatalog.TokenIndex(idxPath, "doc_id", "term", "text"))
    try body(idxPath) finally IndexCatalog.clear()
  }

  test("registered index substitutes a semi-join with identical results") {
    val baseline = tokenQuery.collect().toSet // no index registered yet
    assert(baseline.nonEmpty)
    withIndex { _ =>
      val q = tokenQuery
      assert(hasSemiJoin(q), "expected the filter rewritten to a semi-join:\n" +
        q.queryExecution.optimizedPlan.toString)
      // the index side reaches parquet with the term pushed down
      val physical = q.queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters") &&
        physical.contains("EqualTo(term,the)"),
        s"term filter not pushed to the index scan:\n$physical")
      assert(q.collect().toSet == baseline)
    }
  }

  test("remaining conjuncts survive above the substituted join") {
    withIndex { _ =>
      val q = Tables.load(spark, sfDir, "documents")
        .filter(expr("array_contains(split(text, ' '), 'the') AND n_chars > 100"))
        .select("doc_id")
      assert(hasSemiJoin(q))
      val expected = tokenQuery.filter(col("n_chars") > 100)
        .select("doc_id").collect().toSet
      assert(q.collect().toSet == expected)
    }
  }

  test("a zone-mapped index prunes the postings scan to ≤2 files, same rows") {
    val baseline = tokenQuery.collect().toSet
    val idxPath = tmpDir("tokenidx-zm") + "/idx"
    graft.io.SortedLayout.writeRangeSorted(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct(),
      idxPath, numFiles = 8, col("term"))
    graft.io.ZoneMap.write(spark, idxPath, "term")
    IndexCatalog.register(docsPath,
      IndexCatalog.TokenIndex(idxPath, "doc_id", "term", "text"))
    try {
      val q = tokenQuery
      assert(hasSemiJoin(q))
      // the semi-join's index side reads only the manifest's candidate
      // files — the corpus side's files plus ≤2 posting files
      val idxFiles = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.exists(_.toString.contains("tokenidx-zm")) =>
          lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.length
      }
      assert(idxFiles.nonEmpty && idxFiles.forall(_ <= 2),
        s"postings scan must be manifest-pruned: $idxFiles of 8 files")
      assert(q.collect().toSet == baseline)
    } finally IndexCatalog.clear()
  }

  test("no rewrite without a registered index, for other predicates, or other separators") {
    assert(!hasSemiJoin(tokenQuery)) // nothing registered
    withIndex { _ =>
      val wrongPred = Tables.load(spark, sfDir, "documents")
        .filter(col("n_chars") > 100).select("doc_id")
      assert(!hasSemiJoin(wrongPred))
      val wrongSep = Tables.load(spark, sfDir, "documents")
        .filter(expr("array_contains(split(text, ','), 'the')")).select("doc_id")
      assert(!hasSemiJoin(wrongSep))
      val otherTable = Tables.load(spark, sfDir, "nation")
        .filter(expr("array_contains(split(n_name, ' '), 'the')"))
        .select("n_nationkey")
      assert(!hasSemiJoin(otherTable))
    }
  }
}

package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TargetedDeleteSpec extends SparkSpec {

  test("delete rewrites only the files whose range contains the targets") {
    val s = spark
    val dir = tmpDir("tdel") + "/docs"
    val docs = graft.core.Tables.load(s, sfDir, "documents")
    SortedLayout.writeRangeSorted(docs, dir, numFiles = 8, col("doc_id"))

    val total = s.read.parquet(dir).count()
    // three adjacent ids — under a range-sorted layout they live in
    // one (maybe two) files
    val targets = Seq(10L, 11L, 12L)

    val r = TargetedDelete.deleteIds(s, dir, "doc_id", targets)
    assert(r.rowsDeleted == 3, r)
    assert(r.filesTotal == 8, r)
    assert(r.filesRewritten <= 2,
      s"adjacent ids should hit at most 2 range files, rewrote ${r.filesRewritten}")

    val after = s.read.parquet(dir)
    assert(after.count() == total - 3)
    assert(after.filter(col("doc_id").isin(targets: _*)).count() == 0)
    // every non-target row survives intact (compare against the
    // original source, not the pre-delete listing — those files are gone)
    val expected = docs.filter(!col("doc_id").isin(targets: _*))
      .select(after.columns.map(col).toIndexedSeq: _*)
    assert(after.exceptAll(expected).isEmpty && expected.exceptAll(after).isEmpty)
  }

  test("deleting absent ids touches nothing") {
    val s = spark
    val dir = tmpDir("tdel2") + "/docs"
    SortedLayout.writeRangeSorted(
      graft.core.Tables.load(s, sfDir, "documents"), dir, 4, col("doc_id"))
    val r = TargetedDelete.deleteIds(s, dir, "doc_id", Seq(999999L))
    assert(r == TargetedDelete.Report(0L, 0L, 4L))
  }
}

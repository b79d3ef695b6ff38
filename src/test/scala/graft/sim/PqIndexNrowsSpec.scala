package graft.sim

import graft.SparkSpec

/** The `_nrows` sidecar lifecycle on the PQ index: written at build,
  * and BACKFILLED on the legacy fallback — a version published before
  * the sidecar existed pays one count() in one JVM ever; the next
  * JVM-fresh serve reads the sidecar (r11 verdict #5). */
class PqIndexNrowsSpec extends SparkSpec {

  test("a legacy index without _nrows backfills the sidecar on first serve") {
    val prevRoot = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("nrows-store")
    try {
      val idx = Similarity.s12Index(spark, sfDir)
      val nrows = new java.io.File(s"$idx/_nrows")
      assert(nrows.isFile, "the build writes the sidecar")
      val n = Similarity.indexRowCount(spark, idx)
      assert(n > 0)

      // simulate a legacy version: strip the sidecar and the memo
      assert(nrows.delete())
      Similarity.dropNrowsMemo(idx)
      assert(Similarity.indexRowCount(spark, idx) == n,
        "the fallback count matches the recorded sidecar")
      assert(nrows.isFile, "the fallback BACKFILLS the sidecar beside the version")

      // a JVM-fresh serve must answer from the sidecar alone: with the
      // memo dropped AND the codes unreadable, only the backfilled
      // file can produce the count
      Similarity.dropNrowsMemo(idx)
      val codes = new java.io.File(s"$idx/codes")
      val hidden = new java.io.File(s"$idx/.codes-hidden")
      assert(codes.renameTo(hidden))
      try assert(Similarity.indexRowCount(spark, idx) == n,
        "the second JVM-fresh serve reads the sidecar, not the data")
      finally { assert(hidden.renameTo(codes)); Similarity.dropNrowsMemo(idx) }
    } finally prevRoot match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }
}

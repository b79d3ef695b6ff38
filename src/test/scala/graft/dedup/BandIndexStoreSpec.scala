package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The standing LSH band index lifecycle:
  *  - store-served batch dedup == d15's inline form on d15's own
  *    deterministic split (the oracle gate transitively covers the
  *    store path);
  *  - append == rebuild (band keys are a pure per-doc map — no
  *    geometry to go stale);
  *  - the lifecycle actually accumulates: after appending batch 1,
  *    batch 2 matches against batch-1 docs too;
  *  - compaction folds append files without changing the row set.
  */
class BandIndexStoreSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)

  private def docs = Tables.loadParallel(spark, sfDir, "documents")

  test("store-served batch dedup equals d15's inline form row-for-row") {
    val dir = tmpDir("bandindex-d15")
    BandIndexStore.build(docs.filter(col("doc_id") % 10 =!= 7), dir)
    val served = BandIndexStore.dedupBatch(spark, dir,
      docs.filter(col("doc_id") % 10 === 7))
    val inline = graft.queries.Registry.queries("d15_incremental_dedup")(spark, sfDir)
    assert(rows(served).nonEmpty && rows(served) == rows(inline))
  }

  test("snapshot-served corpus index: row-equal to the band map, stale corpus rebuilds") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = tmpDir("bandindex-snap-src")
    Files.copy(Paths.get(sfDir, "documents.parquet"),
      Paths.get(dir, "documents.parquet"), StandardCopyOption.COPY_ATTRIBUTES): Unit
    val prev = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("bandindex-snap-root")
    try {
      val served = BandIndexStore.corpusIndex(spark, dir)
      assert(rows(served) == rows(BandIndexStore.bandKeys(
        Tables.loadParallel(spark, dir, "documents"))))
      val store = graft.io.DerivedStore.storePath(dir, "band_index")
      assert(graft.io.AtomicPublish.currentVersion(spark, store).contains(1L))
      // a refreshed corpus snapshot (mtime drift) must NOT serve stale bands
      val src = Paths.get(dir, "documents.parquet")
      Files.setLastModifiedTime(src, java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(src).toMillis + 5000)): Unit
      BandIndexStore.corpusIndex(spark, dir).count(): Unit
      assert(graft.io.AtomicPublish.currentVersion(spark, store).contains(2L),
        "corpus drift must republish the band tier")
      // the served probe path keeps d15's output contract
      val batch = Tables.loadParallel(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 7)
      val out = BandIndexStore.dedupBatchAgainstCorpus(spark, dir, batch)
      assert(out.count() == batch.count(), "every batch doc reported")
    } finally prev match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }

  test("append == rebuild, the index accumulates, and compaction preserves it") {
    val base = docs.filter(col("doc_id") % 10 < 6)
    val batch1 = docs.filter(col("doc_id") % 10 === 6)
    val batch2 = docs.filter(col("doc_id") % 10 === 7)
    val inc = tmpDir("bandindex-inc")
    val full = tmpDir("bandindex-full")
    BandIndexStore.build(base, inc)
    BandIndexStore.append(batch1, inc)
    BandIndexStore.build(base.unionByName(batch1), full)
    assert(rows(BandIndexStore.load(spark, inc)) ==
      rows(BandIndexStore.load(spark, full)), "append must equal rebuild")
    // batch 2 sees batch 1's docs as corpus: its dedup against the
    // appended index equals its dedup against the full rebuild
    val viaInc = BandIndexStore.dedupBatch(spark, inc, batch2)
    val viaFull = BandIndexStore.dedupBatch(spark, full, batch2)
    assert(rows(viaInc) == rows(viaFull))
    // compaction: fewer files, same rows, same dedup answers
    def nFiles(d: String) =
      java.nio.file.Files.list(java.nio.file.Paths.get(d))
        .filter(p => p.toString.endsWith(".parquet")).count()
    val before = nFiles(inc)
    graft.io.Compaction.compact(spark, inc, targetBytes = 1L << 30): Unit
    assert(nFiles(inc) < before)
    assert(rows(BandIndexStore.load(spark, inc)) ==
      rows(BandIndexStore.load(spark, full)))
    assert(rows(BandIndexStore.dedupBatch(spark, inc, batch2)) == rows(viaFull))
  }
}

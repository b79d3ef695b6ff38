package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Retention composed with the tier economy (r12 verdict #5): a
  * takedown (`TargetedDelete` on the warehouse corpus) rewrites files
  * in place, so the tier fingerprints classify the drift as Rewritten
  * and every documents-derived tier full-rebuilds — ONCE, that night,
  * with the run-log saying so — and the very next append night is back
  * on the O(Δ) merge path. The cost model is explicit and bounded:
  * takedowns cost one tier-cascade rebuild each, amortized across
  * however many deletes batch into the night, never a lingering tax. */
class TakedownCascadeSpec extends SparkSpec {

  private val night1 = LocalDate.of(2026, 8, 11) // a Tuesday: no weekly gates

  private def writeTable(df: DataFrame, dir: String, table: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")

  private def appendParts(from: String, into: String): Unit =
    Files.list(Paths.get(from)).forEach { f =>
      val n = f.getFileName.toString
      if (!n.startsWith("_") && !n.startsWith("."))
        Files.move(f, Paths.get(into).resolve(n)): Unit
    }

  test("takedown night: documents tiers rebuild once; the next append night merges again") {
    val dir = tmpDir("takedown-src")
    val prevRoot = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("takedown-store")
    val runLog = tmpDir("takedown-log") + "/runlog"
    try {
      val docs = Tables.load(spark, sfDir, "documents").cache()
      writeTable(docs.filter(col("doc_id") % 5 === 0), dir, "documents")
      for (t <- Seq("embeddings", "lineitem", "orders"))
        writeTable(Tables.load(spark, sfDir, t), dir, t)

      val docTiers = Set("tokens_tier", "shingle_tier", "band_index_tier",
        "lsh_components_tier", "media_ann_tier")

      // night 1: everything builds
      val n1 = TierRefresh.refresh(spark, dir, night1, runLog)
      assert(n1.forall(_.status == Pipeline.Succeeded), s"night 1: $n1")

      // the takedown: one document leaves the corpus in place
      val gone = docs.filter(col("doc_id") % 5 === 0)
        .select("doc_id").head().getLong(0)
      val td = graft.io.TargetedDelete.deleteIds(spark,
        s"$dir/documents.parquet", "doc_id", Seq(gone))
      assert(td.rowsDeleted == 1, s"takedown: $td")
      spark.catalog.clearCache()

      // night 2: the in-place rewrite classifies as non-append drift —
      // every documents-derived tier rebuilds ONCE, everything else
      // stays put
      val n2 = TierRefresh.refresh(spark, dir, night1.plusDays(1), runLog)
      assert(n2.forall(_.status == Pipeline.Succeeded), s"night 2: $n2")
      val notes2 = n2.map(r => r.job -> r.note).toMap
      docTiers.foreach(j => assert(notes2(j) == "mode=full v=2",
        s"$j must pay the takedown rebuild exactly once: $notes2"))
      (notes2.keySet -- docTiers - "analyze_raw").foreach(j =>
        assert(notes2(j) == "mode=noop v=1",
          s"$j must not move on a documents-only takedown: $notes2"))

      // the taken-down doc is gone from the rebuilt tiers
      assert(graft.text.TokenStore.served(spark, dir)
        .filter(col("doc_id") === gone).isEmpty,
        s"the token tier must forget doc $gone")
      assert(graft.dedup.BandIndexStore.corpusIndex(spark, dir)
        .filter(col("doc_id") === gone).isEmpty,
        s"the band index must forget doc $gone")

      // night 3: an ordinary append — the cascade is back on O(Δ)
      val stage = tmpDir("takedown-delta")
      docs.filter(col("doc_id") % 5 === 1)
        .coalesce(1).write.parquet(s"$stage/d")
      appendParts(s"$stage/d", s"$dir/documents.parquet")
      val n3 = TierRefresh.refresh(spark, dir, night1.plusDays(2), runLog)
      assert(n3.forall(_.status == Pipeline.Succeeded), s"night 3: $n3")
      val notes3 = n3.map(r => r.job -> r.note).toMap
      docTiers.foreach(j => assert(notes3(j) == "mode=merge v=3",
        s"$j must be back on the merge path the night after a takedown: $notes3"))
      assert(!notes3.values.exists(_.contains("mode=full")),
        s"no rebuild lingers past the takedown night: $notes3")
      docs.unpersist(): Unit
    } finally prevRoot match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }
}

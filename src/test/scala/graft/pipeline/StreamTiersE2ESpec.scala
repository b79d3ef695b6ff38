package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.streaming.StreamTierIngest

/** The full stream→tiers cascade (the reference's T0→T5 nightly in its
  * streaming-era form): documents arrive through the ingest gate,
  * the nightly DAG folds the gate's batch partitions, publishes the
  * folded survivors into the warehouse corpus table as append-only
  * part files, and every standing tier then refreshes off that drift
  * through its O(Δ) merge path — no full rebuild anywhere on an
  * append-only night, with the run-log carrying mode per tier. Tier
  * incrementality and stream ingest are each spec-gated on their own;
  * this is the composition. */
class StreamTiersE2ESpec extends SparkSpec {

  private val night1 = LocalDate.of(2026, 8, 11) // a Tuesday: no weekly gates

  private def writeTable(df: DataFrame, dir: String, table: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")

  test("stream ingest → survivors fold → corpus sync → every tier merges, none rebuilds") {
    val dir = tmpDir("stream-e2e-src")
    val base = tmpDir("stream-e2e-gate")
    val prevRoot = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("stream-e2e-store")
    val runLog = tmpDir("stream-e2e-log") + "/runlog"
    try {
      // warehouse snapshot: documents split so the stream can deliver
      // the rest (% 5 == 0 keeps every centroid-eligible id in the
      // base — the media_ann merge-eligibility shape)
      val docs = Tables.load(spark, sfDir, "documents").cache()
      writeTable(docs.filter(col("doc_id") % 5 === 0), dir, "documents")
      for (t <- Seq("embeddings", "lineitem", "orders"))
        writeTable(Tables.load(spark, sfDir, t), dir, t)

      // night 1: the standing tiers build from the pre-stream corpus
      val n1 = TierRefresh.refresh(spark, dir, night1, runLog)
      assert(n1.forall(_.status == Pipeline.Succeeded), s"night 1: $n1")
      assert(n1.filterNot(_.job == "analyze_raw")
        .forall(_.note == "mode=full v=1"), s"night 1 builds all: $n1")
      assert(n1.find(_.job == "analyze_raw").exists(_.note == "tables=4/10"),
        s"the raw-table analyze leads the night: $n1")

      // the ingest gate, bootstrapped from the SAME corpus the tiers
      // serve (content-keyed: a re-crawl of a corpus doc is a dup)
      val in = s"$base/in"; val out = s"$base/out"
      val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
      val corpus = Tables.load(spark, dir, "documents")
      StreamTierIngest.bootstrapIndex(corpus, idx)
      docs.filter(col("doc_id") % 5 =!= 0)
        .coalesce(1).write.mode("append").parquet(in)
      val q = StreamTierIngest.start(spark, in, docs.schema, idx, out, ckpt)
      q.awaitTermination(); q.stop()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spark.read.parquet(out).count() > 0, "the stream delivered survivors")

      // night 2: one DAG — fold both gate sinks, sync the folded
      // survivors into documents.parquet, then serve every tier with a
      // dep on the sync so the cascade sees the night's drift
      val nightJobs = Seq(
        TierRefresh.streamFoldJob("stream_band_fold", idx, ckpt),
        TierRefresh.survivorsFoldJob("stream_surv_fold", out, ckpt),
        TierRefresh.corpusSyncJob("stream_corpus_sync", out,
          s"$dir/documents.parquet", deps = Seq("stream_surv_fold"))) ++
        TierRefresh.jobs(dir).map(j =>
          j.copy(deps = j.deps :+ "stream_corpus_sync")(j.body))
      val n2 = Pipeline.run(spark, nightJobs, night1.plusDays(1), runLog)
      assert(n2.forall(_.status == Pipeline.Succeeded), s"night 2: $n2")
      val notes = n2.map(r => r.job -> r.note).toMap
      assert(notes("stream_band_fold").startsWith("folded=2"), // bootstrap + batch 0
        s"the band index folds on the DAG: $notes")
      assert(notes("stream_surv_fold").startsWith("folded=1"),
        s"the survivors fold on the DAG: $notes")
      assert(notes("stream_corpus_sync").matches("synced=\\d+ upto=0"),
        s"the folded survivors publish append-only: $notes")

      // the payoff: every documents-derived tier takes its merge path
      // over the stream-grown corpus; nothing rebuilds, nothing else
      // moves — an append-only night costs O(Δ) across the cascade
      val mergedJobs = Set("tokens_tier", "shingle_tier", "band_index_tier",
        "lsh_components_tier", "media_ann_tier")
      mergedJobs.foreach(j => assert(notes(j) == "mode=merge v=2",
        s"$j must merge the synced delta: $notes"))
      val streamJobs = Set("stream_band_fold", "stream_surv_fold", "stream_corpus_sync")
      (notes.keySet -- mergedJobs -- streamJobs - "analyze_raw").foreach(j =>
        assert(notes(j) == "mode=noop v=1",
          s"$j must not move on a documents-only night: $notes"))
      // (the gate's own FIRST folds are mode=full by definition — the
      // no-rebuild claim is about the standing tiers)
      assert(!(notes -- streamJobs).values.exists(_.contains("mode=full")),
        s"no tier rebuild anywhere on an append-only night: $notes")

      // and the merged tiers actually CONTAIN the stream's documents
      val syncedId = StreamTierIngest.survivors(spark, out)
        .select("doc_id").head().getLong(0)
      assert(!graft.text.TokenStore.served(spark, dir)
        .filter(col("doc_id") === syncedId).isEmpty,
        s"the token tier serves the streamed doc $syncedId")
      assert(!graft.dedup.BandIndexStore.corpusIndex(spark, dir)
        .filter(col("doc_id") === syncedId).isEmpty,
        s"the band index serves the streamed doc $syncedId")

      // night 3, nothing new: the whole cascade is a no-op
      val n3 = Pipeline.run(spark, nightJobs, night1.plusDays(2), runLog)
      assert(n3.forall(r => r.status == Pipeline.Succeeded &&
        (r.note == "noop" || r.note == "mode=noop v=2" ||
          r.note == "mode=noop v=1" || r.note.startsWith("tables="))),
        s"an unchanged night re-publishes nothing: ${n3.map(r => r.job -> r.note)}")
      docs.unpersist(): Unit
    } finally prevRoot match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }
}

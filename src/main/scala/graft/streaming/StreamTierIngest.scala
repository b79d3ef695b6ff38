package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.Caching.RegisterSyntax
import graft.dedup.BandIndexStore
import graft.io.IdempotentWriter

/** Streaming corpus ingest with standing-index maintenance — d15's
  * incremental-dedup lifecycle as a Structured Streaming job: each
  * arriving micro-batch of documents is deduped against the
  * PERSISTENT LSH band index (content-keyed, so a re-crawl under a
  * new doc_id is still a dup), the survivors land in the corpus sink,
  * and their band keys extend the index — so tomorrow's batch dedups
  * against today's arrivals with no batch re-serve in between.
  *
  * Exactly-once without a transactional sink: BOTH writes are
  * batch-id-keyed dynamic partition refreshes
  * ([[IdempotentWriter.partitionRefresh]] — the fileIngest pattern),
  * and the probe EXCLUDES the current batch's own index partition, so
  * Structured Streaming's crash-replay contract (same batchId, same
  * data) recomputes identical survivors and overwrites its own
  * partitions instead of matching the batch against its own
  * half-written bands (which would silently drop every replayed doc).
  *
  * Contract notes: dedup is against the index as of the batch's start
  * (d15's exact semantics); WITHIN-batch duplicates both survive —
  * the intra-batch pass is d1/d3's job at the next compaction, not
  * the ingest gate's.
  *
  * Per-batch cost, honestly: the batch-side compute (shingle + md5 +
  * minhash, the dominant work) is O(|batch|) and paid once per batch;
  * the probe JOIN reads the index's three pruned key columns — that
  * scan is O(|index|) I/O because the partitioning key here is
  * ingest_batch (for replay idempotency), not band_hash, so file-level
  * key pruning can't apply. What never re-runs is the HISTORY'S
  * compute: no text is re-read, no md5 re-paid. When the key-column
  * scan itself becomes the bottleneck, fold the accumulated batch
  * partitions into the snapshot-keyed `BandIndexStore.corpusIndex`
  * (band_hash-sorted, file-pruned probes) on the nightly
  * `pipeline/TierRefresh` cadence and restart the stream's index from
  * the compacted base.
  */
object StreamTierIngest {

  /** Seed the stream-owned index from a corpus snapshot (partition
    * `ingest_batch=-1`; every later batch owns `ingest_batch=<id>`). */
  def bootstrapIndex(corpus: DataFrame, indexDir: String): Unit =
    IdempotentWriter.partitionRefresh(
      BandIndexStore.bandKeys(corpus).withColumn("ingest_batch", lit(-1L)),
      indexDir, "ingest_batch"): Unit

  /** The standing index as a frame (the `ingest_batch` column rides
    * along; consumers key on (band_idx, band_hash, doc_id)). */
  def index(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(indexDir)

  def start(s: SparkSession, srcDir: String, schema: StructType,
            indexDir: String, survivorsDir: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    s.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) graft.core.Caching.withReleased {
          // ONE shingle+md5+minhash pass per batch: the cached band
          // frame feeds the dedup probe AND the survivors' index
          // append (r10 review — recomputing it per write doubled the
          // gate's dominant map cost)
          val bands = BandIndexStore.bandKeys(batch).registerCache()
          // probe the index WITHOUT this batch's own partition: on a
          // crash-replay the half-written bands from the failed
          // attempt must not make the batch match itself
          val probe = index(s, indexDir).filter(col("ingest_batch") =!= id)
          val report = BandIndexStore.dedupBatchWithBands(probe, batch, bands)
          val kept = batch
            .join(report.filter(!col("is_dup")).select("doc_id"),
              Seq("doc_id"), "left_semi")
            .withColumn("ingest_batch", lit(id))
            .registerCache() // feeds the sink AND the index append
          IdempotentWriter.partitionRefresh(kept, survivorsDir, "ingest_batch"): Unit
          IdempotentWriter.partitionRefresh(
            bands.join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
              .withColumn("ingest_batch", lit(id)),
            indexDir, "ingest_batch"): Unit
        }
      }
      .start()
}

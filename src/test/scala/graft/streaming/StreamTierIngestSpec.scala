package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The streaming ingest gate over the persistent band index: arriving
  * batches dedup against the corpus AND against every earlier batch's
  * survivors (the standing index grows per batch), and the whole
  * pipeline is replay-safe — a crash-replay of an applied batch
  * recomputes the same survivors into the same partitions. */
class StreamTierIngestSpec extends SparkSpec {

  private def docs = Tables.load(spark, sfDir, "documents")

  /** Drain-and-stop: AvailableNow self-terminates, but the query stays
    * in the active registry briefly after awaitTermination — a fast
    * same-checkpoint restart then trips the concurrent-use guard. */
  private def drain(in: String, schema: org.apache.spark.sql.types.StructType,
                    idx: String, out: String, ckpt: String): Unit = {
    val q = StreamTierIngest.start(spark, in, schema, idx, out, ckpt)
    q.awaitTermination()
    q.stop()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
  }

  /** Re-crawls: same text, new ids — content dups the gate must drop. */
  private def copiesOf(d: DataFrame, offset: Long): DataFrame =
    d.withColumn("doc_id", col("doc_id") + lit(offset))

  test("batches dedup against corpus + earlier survivors; replay is exactly-once") {
    val base = tmpDir("stream-tier")
    val in = s"$base/in"; val out = s"$base/out"
    val idx = s"$base/idx"; val ckpt = s"$base/ckpt"
    val schema = docs.schema

    val corpus = docs.filter(col("doc_id") % 3 === 0).cache()
    StreamTierIngest.bootstrapIndex(corpus, idx)
    val bootBands = StreamTierIngest.index(spark, idx).count()

    // batch 0: genuinely new docs + 20 re-crawled corpus docs
    val fresh1 = docs.filter(col("doc_id") % 3 === 1).cache()
    val dupes1 = copiesOf(corpus.limit(20), 1000000L)
    fresh1.unionByName(dupes1).coalesce(1).write.mode("append").parquet(in)
    drain(in, schema, idx, out, ckpt)

    val s1 = spark.read.parquet(out)
    assert(s1.filter(col("doc_id") >= 1000000L).count() == 0,
      "re-crawled corpus docs must be dropped by content")
    // the synthetic corpus plants near-dup families, so SOME fresh docs
    // may legitimately match the corpus index; every survivor must be
    // a fresh doc and the clearly-unique majority must survive
    val kept1 = s1.count()
    assert(kept1 > 0 && kept1 <= fresh1.count())
    assert(StreamTierIngest.index(spark, idx).count() == bootBands + kept1 * 4,
      "survivors' 4 band keys each must extend the index")

    // batch 1: re-crawls of batch-0 SURVIVORS (cross-batch dups — the
    // standing index already carries their bands) + a few new docs
    val survivorIds = s1.select("doc_id").limit(15)
    val dupes2 = copiesOf(docs.join(survivorIds, "doc_id"), 2000000L)
    val fresh2 = docs.filter(col("doc_id") % 3 === 2).limit(10)
    dupes2.unionByName(fresh2)
      .coalesce(1).write.mode("append").parquet(in)
    drain(in, schema, idx, out, ckpt)

    val s2 = spark.read.parquet(out)
    assert(s2.filter(col("doc_id") >= 2000000L).count() == 0,
      "yesterday's survivors must gate today's re-crawls — no batch re-serve")
    val total = s2.count()
    assert(total > kept1, "genuinely new batch-1 docs survive")

    // THE crash window (kill-mid-batch's shape): the foreachBatch body
    // completed (survivors + index partitions written) but the query
    // died before committing batch 1 to its checkpoint. Deleting the
    // commit record replays batch 1 with the SAME id over the SAME
    // files; the self-partition-excluded probe must see the batch-0
    // survivors' bands (still gating dupes2) while NOT matching the
    // replayed docs against their own half-written partition.
    val lastCommit = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$ckpt/commits")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(!_.getFileName.toString.startsWith("."))
      .maxBy(_.getFileName.toString.toLong)
    java.nio.file.Files.delete(lastCommit)
    // the local-FS checksum shadow must go with it, or the replay's
    // commit rename collides with the stale .crc
    java.nio.file.Files.deleteIfExists(lastCommit.resolveSibling(
      "." + lastCommit.getFileName.toString + ".crc")): Unit
    drain(in, schema, idx, out, ckpt)
    assert(spark.read.parquet(out).count() == total,
      "a same-batch crash-replay must not duplicate or drop survivors")
    assert(spark.read.parquet(out)
      .filter(col("doc_id") >= 2000000L).count() == 0,
      "the replayed batch still gates on the earlier batches' bands")

    // restart with the intact checkpoint: nothing reprocessed
    drain(in, schema, idx, out, ckpt)
    assert(spark.read.parquet(out).count() == total)
    corpus.unpersist(); fresh1.unpersist(): Unit
  }
}

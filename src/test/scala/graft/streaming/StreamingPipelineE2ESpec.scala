package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.io.AggView
import graft.streaming.LatestState.Ev

/** The streaming analog of `CleanPipelineSpec` / `TextPipelineE2ESpec`:
  * the whole continuous path composed end to end —
  *
  *   at-least-once stream (duplicate deliveries across micro-batches)
  *     → StreamDedup.dedupEvents   (watermark-bounded suppression)
  *     → foreachBatch AggView.mergeBatch  (ledgered additive merge)
  *     → continuously-correct per-type counts view
  *
  * Pins: (1) the final view equals the batch answer over DISTINCT
  * logical events — transport redelivery is invisible downstream;
  * (2) a replayed foreachBatch invocation (Structured Streaming's
  * crash-recovery contract: same batchId, same data) is a ledgered
  * no-op, so the composed pipeline is exactly-once end to end;
  * (3) a fresh batch after the replay still merges — the ledger
  * rejects only what it has seen.
  */
class StreamingPipelineE2ESpec extends SparkSpec {

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)
  private def ev(id: Long, et: String, m: Long) = Ev(id, at(m), id % 7, et, 1.0)

  test("dedup -> ledgered merge is exactly-once end to end") {
    val s = spark
    import s.implicits._
    val viewDir = Files.createTempDirectory("stream-e2e").toString + "/view"

    // 30 logical events; ids 10-19 are DELIVERED TWICE, the second
    // copy in a later micro-batch (the at-least-once transport shape)
    val logical = (1L to 30L).map(i => ev(i, if (i % 3 == 0) "click" else "view", i % 50))
    val batch1 = logical.take(20)
    val batch2 = logical.drop(20) ++ logical.slice(9, 19) // redeliveries
    val keys = Seq("event_type")
    val aggs = Seq("n_events" -> count(lit(1)).as("n_events"))

    val mem = MemoryStream[Ev](s)
    val q = StreamDedup.dedupEvents(mem.toDS().toDF(), delay = "2 hours")
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        AggView.mergeBatch(s, viewDir, id, df, keys, aggs): Unit
      }
      .start()
    try {
      Seq(batch1, batch2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // (1) view == batch answer over distinct logical events
    val expected = logical.groupBy(_.event_type).view.mapValues(_.size.toLong).toMap
    def viewNow(): Map[String, Long] =
      AggView.read(s, viewDir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viewNow() === expected)

    // (2) replaying an applied batch is a no-op (same id, same rows)
    val replayed = AggView.mergeBatch(s, viewDir, 0L,
      batch1.toDF(), keys, aggs)
    assert(!replayed && viewNow() === expected)

    // (3) a genuinely new batch still merges after the replay
    val extra = Seq(ev(100L, "click", 1))
    assert(AggView.mergeBatch(s, viewDir, 99L, extra.toDF(), keys, aggs))
    assert(viewNow() === expected.updated("click", expected("click") + 1))
  }
}

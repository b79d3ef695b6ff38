package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamDedupSpec extends SparkSpec {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long)

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)

  test("duplicates within the watermark horizon are suppressed, " +
       "across batches and under normalization") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[Doc](s)
    val q = StreamDedup.firstSightings(in.toDF())
      .writeStream.format("memory").queryName("dedup_within")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: a doc, an exact dup, and a whitespace/case variant dup
      in.addData(
        Doc(1, at(0), "alpha beta gamma"),
        Doc(2, at(1), "alpha beta gamma"),
        Doc(3, at(2), "  Alpha   beta GAMMA "))
      q.processAllAvailable()
      // batch 2: another dup 5 min later (inside the 10-min horizon)
      // and one genuinely new doc
      in.addData(Doc(4, at(5), "alpha beta gamma"), Doc(5, at(5), "delta"))
      q.processAllAvailable()
      val ids = s.sql("SELECT doc_id FROM dedup_within").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(1L, 5L), s"expected first sightings only, got $ids")
    } finally q.stop()
  }

  test("state is bounded: a key re-admits after the watermark evicts it") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[Doc](s)
    val q = StreamDedup.firstSightings(in.toDF())
      .writeStream.format("memory").queryName("dedup_evict")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(Doc(1, at(0), "alpha"))
      q.processAllAvailable()
      // advance the watermark far past t=0+10min: state for "alpha"
      // is evicted (this is the bounded-state guarantee)
      in.addData(Doc(2, at(60), "filler"))
      q.processAllAvailable()
      in.addData(Doc(3, at(61), "filler two"))
      q.processAllAvailable()
      // the same content reappears above the watermark: re-admitted,
      // by design — the stream guarantees the near-horizon window only
      in.addData(Doc(4, at(55), "alpha"))
      q.processAllAvailable()
      val ids = s.sql("SELECT doc_id FROM dedup_evict").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 3L, 4L),
        s"evicted key should re-admit, got $ids")
    } finally q.stop()
  }

  test("event-id dedup drops at-least-once transport duplicates") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[Ev](s)
    val q = StreamDedup.dedupEvents(in.toDF())
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(Ev(100, at(0), 1), Ev(101, at(1), 2))
      q.processAllAvailable()
      // redelivery of 100 (same id, same payload) in a later batch
      in.addData(Ev(100, at(0), 1), Ev(102, at(2), 3))
      q.processAllAvailable()
      val n = s.sql("SELECT count(*) FROM dedup_events").collect()(0).getLong(0)
      assert(n == 3, s"expected 3 unique events, got $n")
    } finally q.stop()
  }
}

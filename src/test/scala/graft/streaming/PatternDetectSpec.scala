package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.LatestState.Ev
import graft.streaming.PatternDetect.MatchRow

/** Contract pins for the streaming A→B-within-W detector:
  *  - stream/batch parity however events split across micro-batches
  *    (in event-time order up to the watermark);
  *  - the latest-A policy: a newer A replaces an older one, one A may
  *    serve several Bs, B before any A or beyond the window never
  *    matches;
  *  - lag accounting is exact event-time difference.
  */
class PatternDetectSpec extends SparkSpec {

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)
  private def ev(id: Long, user: Long, et: String, min: Long) =
    Ev(id, at(min), user, et, 1.0)

  // user 1: A(1) at 0 → B(2) at 10 (match, 10m); B(3) at 45 (beyond W)
  // user 2: B(4) at 5 with no prior A (no match); A(5) at 6;
  //         A(6) at 8 replaces it; B(7) at 20 matches A(6), lag 12m;
  //         B(8) at 25 matches A(6) again, lag 17m (one A, two Bs)
  // user 3: A(9) at 0, nothing after (state times out silently)
  // Feed order is globally time-ascending: a batch split at any point
  // then respects the up-to-watermark ordering contract (an early
  // event fed after a much later one would be dropped as late — that
  // is watermark semantics, not a detector defect).
  private val all = Seq(
    ev(1, 1, "view", 0), ev(9, 3, "view", 0),
    ev(4, 2, "purchase", 5), ev(5, 2, "view", 6), ev(6, 2, "view", 8),
    ev(2, 1, "purchase", 10),
    ev(7, 2, "purchase", 20), ev(8, 2, "purchase", 25),
    ev(3, 1, "purchase", 45))

  private val expected = Set(
    MatchRow(1L, 1L, 2L, 10L * 60000),
    MatchRow(2L, 6L, 7L, 12L * 60000),
    MatchRow(2L, 6L, 8L, 17L * 60000))

  test("batch fold implements the latest-A policy exactly") {
    val s = spark
    assert(PatternDetect.matchesBatch(s.createDataset(all)(
      org.apache.spark.sql.Encoders.product[Ev])).collect().toSet == expected)
  }

  test("stream equals batch across uneven micro-batch splits") {
    val s = spark
    import s.implicits._
    for (cut <- Seq(2, 5, 7)) {
      val (b1, b2) = all.splitAt(cut)
      val mem = MemoryStream[Ev](s)
      val name = s"pd_$cut"
      val q = PatternDetect.matches(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        Seq(b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        assert(s.table(name).as[MatchRow].collect().toSet == expected,
          s"split at $cut")
      } finally q.stop()
    }
  }
}

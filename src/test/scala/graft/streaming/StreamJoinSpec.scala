package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {

  case class Ev(event_id: Long, user_id: Long, ts: Timestamp)

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)

  test("stream-stream interval join attributes clicks to prior views within 10 minutes") {
    val s = spark
    import s.implicits._
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    val q = StreamJoin.attributeClicks(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // view v1 at t=0 (user 1), v2 at t=3 (user 2)
      views.addData(Ev(101, 1, at(0)), Ev(102, 2, at(3)))
      q.processAllAvailable()
      // click at t=5 by user 1 -> attributes to v1;
      // click at t=20 by user 2 -> 17 min after v2, outside the window
      clicks.addData(Ev(201, 1, at(5)), Ev(202, 2, at(20)))
      q.processAllAvailable()
      // a view arriving in a LATER batch than the click it matches:
      // stream-stream state holds both sides, so order doesn't matter
      clicks.addData(Ev(203, 3, at(8)))
      q.processAllAvailable()
      views.addData(Ev(103, 3, at(6)))
      q.processAllAvailable()
      val rows = s.sql("SELECT click_id, view_id FROM attributed").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((201L, 101L), (203L, 103L)))
    } finally q.stop()
  }

  test("interval-join state is dropped once the watermark passes (no unbounded growth)") {
    val s = spark
    import s.implicits._
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    val q = StreamJoin.attributeClicks(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attributed_wm")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      views.addData(Ev(101, 1, at(0)))
      clicks.addData(Ev(200, 9, at(0)))
      q.processAllAvailable()
      // advance both watermarks far past v101's retention bound
      views.addData(Ev(110, 8, at(600)))
      clicks.addData(Ev(210, 9, at(600)))
      q.processAllAvailable()
      // a click that WOULD match v101 arrives hopelessly late: the
      // watermark already discarded that state, so no row appears
      clicks.addData(Ev(299, 1, at(5)))
      q.processAllAvailable()
      val n = s.sql("SELECT * FROM attributed_wm WHERE click_id = 299").count()
      assert(n == 0, "late click matched state that should have been evicted")
    } finally q.stop()
  }

  test("left-outer interval join emits unattributed clicks with null view " +
       "once the watermark passes the join tolerance") {
    val s = spark
    import s.implicits._
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    val q = StreamJoin.attributeClicksOuter(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attributed_outer")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // matched click (user 1) and an orphan click (user 7, no views)
      views.addData(Ev(101, 1, at(0)))
      clicks.addData(Ev(201, 1, at(5)), Ev(202, 7, at(5)))
      q.processAllAvailable()
      // the matched pair can emit immediately; the orphan must WAIT:
      // a matching view could still arrive until the watermark passes
      // click_ts + 10 min
      val early = s.sql("SELECT click_id FROM attributed_outer WHERE view_id IS NULL").count()
      assert(early == 0, "outer row emitted before the watermark sealed it")
      // advance both watermarks decisively past t=15
      views.addData(Ev(110, 8, at(120)))
      clicks.addData(Ev(210, 8, at(120)))
      q.processAllAvailable()
      views.addData(Ev(111, 8, at(240)))
      clicks.addData(Ev(211, 8, at(240)))
      q.processAllAvailable()
      val rows = s.sql("SELECT click_id, view_id FROM attributed_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((201L, 101L)), "matched click missing")
      assert(rows.contains((202L, -1L)), "orphan click never emitted null-padded")
    } finally q.stop()
  }
}

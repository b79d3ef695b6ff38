package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.Sessionize.{Event, GapUs}

class SessionizeSpec extends SparkSpec {

  test("batch sessions partition each user's events with no intra-session gap > 30min") {
    val sessions = Sessionize.sessionizeBatch(spark, sfDir).toDF()
    val events = graft.core.Tables.load(spark, sfDir, "events")
    // conservation: every event lands in exactly one session
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == events.count())
    // sessions of one user never overlap
    val overlaps = sessions.as("a").join(sessions.as("b"),
      col("a.user_id") === col("b.user_id") &&
      col("a.session_start_us") < col("b.session_start_us") &&
      col("b.session_start_us") <= col("a.session_end_us") + GapUs)
    assert(overlaps.isEmpty)
    assert(sessions.filter(col("session_end_us") < col("session_start_us")).isEmpty)
  }

  test("streaming flavour closes a session when a later batch crosses the gap") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Event](s)
    val q = Sessionize.sessionizeStream(mem.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)
      mem.addData(Event(1, at(0), "click", 1.0), Event(1, at(10), "view", 2.0))
      q.processAllAvailable()
      // 2 hours later: previous session must close (gap exceeded)
      mem.addData(Event(1, at(120), "click", 3.0))
      q.processAllAvailable()
      mem.addData(Event(1, at(240), "click", 4.0))
      q.processAllAvailable()
      val out = s.sql("SELECT * FROM sessions_out").collect()
      assert(out.length >= 1)
      val first = out.minBy(_.getAs[Long]("session_start_us"))
      assert(first.getAs[Long]("n_events") == 2)
      assert(first.getAs[Long]("sum_cents") == 300)
    } finally q.stop()
  }
}

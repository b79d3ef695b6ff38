package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.LatestState.{Ev, LatestRow}

/** Batch/stream parity for the keep-latest-per-key snapshot: however
  * events are split across micro-batches (including out-of-order
  * arrivals), the stream's most recent emission per key equals the
  * batch winner over the union of all events.
  */
class LatestStateSpec extends SparkSpec {

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)

  // user 1: later event arrives FIRST (out of order); user 2: ts tie
  // broken by event_id; user 3: single event
  private val batches: Seq[Seq[Ev]] = Seq(
    Seq(Ev(10, at(50), 1, "click", 1.0), Ev(11, at(5), 1, "view", 2.0),
        Ev(20, at(10), 2, "click", 3.0)),
    Seq(Ev(12, at(20), 1, "view", 4.5),
        Ev(21, at(10), 2, "purchase", 7.25),
        Ev(30, at(1), 3, "click", 0.07)))

  test("stream snapshot equals batch max_by over the full event set") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[Ev](s)
    val q = LatestState.latestStream(mem.toDS())
      .writeStream.format("memory").queryName("latest_state")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    val streamed =
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // most recent emission per key = the row with the max winner pair
        s.sql("SELECT * FROM latest_state").as[LatestRow]
          .groupByKey(_.user_id)
          .reduceGroups((a: LatestRow, b: LatestRow) =>
            if (a.last_ts_us > b.last_ts_us ||
              (a.last_ts_us == b.last_ts_us && a.last_event_id >= b.last_event_id)) a
            else b)
          .map(_._2).collect().toSet
      } finally q.stop()

    val all = batches.flatten
    val expected = LatestState.latestBatch(s.createDataset(all)).collect().toSet
    assert(streamed == expected)
    // and the parity reference itself: user 1 keeps event 10 (latest
    // ts even though it arrived first); user 2's ts tie -> event 21
    assert(expected == Set(
      LatestRow(1, 10, "click", at(50).getTime * 1000, 100),
      LatestRow(2, 21, "purchase", at(10).getTime * 1000, 725),
      LatestRow(3, 30, "click", at(1).getTime * 1000, 7)))
  }

  test("q45's SQL expression agrees with the typed batch reference") {
    val s = spark
    import s.implicits._
    val df = s.createDataset(batches.flatten).toDF()
    val viaSql = df
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(expr(
        """max_by(named_struct('event_id', event_id, 'event_type', event_type,
                               'us', us, 'cents', cents),
                  named_struct('us', us, 'event_id', event_id))""").as("last"))
      .select(col("user_id"), col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.us").as("last_ts_us"), col("last.cents").as("last_value_cents"))
      .as[LatestRow].collect().toSet
    val expected = LatestState.latestBatch(s.createDataset(batches.flatten))
      .collect().toSet
    assert(viaSql == expected)
  }
}

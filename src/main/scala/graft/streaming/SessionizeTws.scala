package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState, ExpiredTimerInfo}

import Sessionize.{foldEvents, Event, Session, SessionState, GapUs}

/** Sessionization on Spark 4's `transformWithState` — the successor
  * API to `flatMapGroupsWithState` (`Sessionize`): explicit named
  * state variables with per-state TTL, first-class timers (several per
  * key instead of one timeout), and the RocksDB state store provider
  * (required by the API; also the provider a production deployment
  * runs for state larger than executor heap).
  *
  * Same semantics as [[Sessionize.sessionizeStream]]: per-user
  * sessions closed after a 30-minute event-time gap, O(1) state per
  * user (the open-session aggregate), emission on gap-timer expiry.
  * `SessionizeTwsSpec` drives both implementations over the same
  * MemoryStream input and asserts identical closed sessions.
  */
object SessionizeTws {

  class SessionProcessor extends StatefulProcessor[Long, Event, Session] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val open = if (state.exists()) Some(state.get()) else None
      val (closed, next) = foldEvents(userId, rows, open)
      open.foreach(s => getHandle.deleteTimer((s.endUs + GapUs) / 1000))
      next match {
        case Some(s) =>
          state.update(s)
          getHandle.registerTimer((s.endUs + GapUs) / 1000)
        case None => state.clear()
      }
      closed.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(Sessionize.close(userId, s))
      } else Iterator.empty
  }

  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming — `flatMapGroupsWithState` sessionization
  * of the events stream: per-user sessions closed after a 30-minute
  * event-time gap. The reference has no stateful streaming (late data
  * is handled by reprocessing whole day partitions, SURVEY §2.10); this
  * is the Spark-native operator a streaming engine needs for the same
  * job without the reprocess.
  *
  * State per user is O(1) (the open-session aggregate, not the
  * events), so a 1000-executor run holds |active users| tiny states
  * sharded by the groupBy key — the scale-correct shape.
  *
  * Outputs are oracle-exact: timestamps as epoch micros (int64) and
  * values summed in cents (int64) — no float accumulation, no
  * Timestamp millisecond truncation.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  case class SessionState(startUs: Long, endUs: Long, n: Long, cents: Long)

  case class Session(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_cents: Long)

  val GapUs: Long = 30L * 60 * 1000000

  private def tsMicros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private[streaming] def close(userId: Long, s: SessionState): Session =
    Session(userId, s.startUs, s.endUs, s.n, s.cents)

  /** Fold a user's (sorted) events into closed sessions + the open one. */
  private[streaming] def foldEvents(
      userId: Long, events: Iterator[Event],
      open: Option[SessionState]): (Seq[Session], Option[SessionState]) = {
    val sorted = events.toSeq.sortBy(e => (tsMicros(e.ts), e.event_type))
    var state = open
    val closed = Seq.newBuilder[Session]
    for (e <- sorted) {
      val t = tsMicros(e.ts)
      val cents = Math.round(e.value * 100)
      state match {
        case Some(s) if t - s.endUs <= GapUs =>
          state = Some(s.copy(endUs = t, n = s.n + 1, cents = s.cents + cents))
        case Some(s) =>
          closed += close(userId, s)
          state = Some(SessionState(t, t, 1, cents))
        case None =>
          state = Some(SessionState(t, t, 1, cents))
      }
    }
    (closed.result(), state)
  }

  /** Streaming flavour: emits closed sessions, keeps the open one in
    * `GroupState` with an event-time timeout at `end + gap`.
    */
  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, events: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(userId, s))
          } else {
            val (closed, open) = foldEvents(userId, events, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp((s.endUs + GapUs) / 1000)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }

  /** Batch flavour — same session semantics over the events table,
    * emitting open sessions too (a completed day partition, the
    * reference's M4 backfill path). Oracle: gaps-and-islands SQL.
    */
  def sessionizeBatch(spark: SparkSession, dir: String): Dataset[Session] = {
    import spark.implicits._
    graft.core.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, events: Iterator[Event]) =>
        val (closed, open) = foldEvents(userId, events, None)
        (closed ++ open.map(close(userId, _))).iterator
      }
  }

  val q17Sessionize: (SparkSession, String) => DataFrame =
    (s, dir) => sessionizeBatch(s, dir).toDF()

  /** Gaps-and-islands: a session break where the gap to the previous
    * event exceeds 30 minutes; running sum of breaks = session id.
    */
  val q17SessionizeSql: String = s"""
    WITH e AS (
      SELECT user_id, ts, event_type, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_type) AS prev_us
      FROM events),
    m AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > $GapUs
                         THEN 1 ELSE 0 END AS brk FROM e),
    g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                   ORDER BY us, event_type
                                   ROWS UNBOUNDED PRECEDING) AS sid FROM m)
    SELECT user_id,
           min(us) AS session_start_us,
           max(us) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM g GROUP BY user_id, sid"""

  /** q31 — the same sessions via Spark's *native* `session_window`
    * aggregation (one shuffle; the engine merges overlapping gap
    * windows itself, no custom state code). Boundary semantics differ
    * from q17 by design: session_window intervals are half-open, so a
    * gap of exactly 30 minutes SPLITS here (`>=` in the oracle) while
    * q17's custom fold merges it (`>`). `session_window.start` carries
    * full microsecond precision (verified against the oracle).
    */
  val q31SessionWindow: (SparkSession, String) => DataFrame = (s, dir) => {
    import org.apache.spark.sql.functions._
    graft.core.Tables.load(s, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value*100) as bigint)")).as("sum_cents"))
      .select(col("user_id"),
        expr("unix_micros(sw.start)").as("session_start_us"),
        col("n_events"), col("sum_cents"))
  }

  val q31SessionWindowSql: String = s"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts)) AS prev_us
      FROM events),
    m AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= $GapUs
                         THEN 1 ELSE 0 END AS brk FROM e),
    g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                   ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) AS sid FROM m)
    SELECT user_id,
           min(us) AS session_start_us,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM g GROUP BY user_id, sid"""
}

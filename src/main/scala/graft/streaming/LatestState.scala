package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming flavour of the q45 keep-latest-per-key snapshot (log
  * compaction): a continuously-maintained "current state per user"
  * over the event stream — the CDC materialized view the reference
  * rebuilds from scratch every day with delete-then-append
  * (`AWS_GLUE_ETL.py:124-132`).
  *
  * State is O(1) per key (just the winning row), updates emit in
  * Update mode, and the winner ordering — (event-time micros,
  * event_id), exactly q45's `max_by` pair — makes the stream's final
  * answer equal the batch query on the same data regardless of how
  * events are split across micro-batches or arrive out of order.
  * `LatestStateSpec` asserts that batch/stream parity.
  */
object LatestState {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  case class LatestRow(user_id: Long, last_event_id: Long,
                       last_event_type: String, last_ts_us: Long,
                       last_value_cents: Long)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  private[streaming] def candidate(e: Ev): LatestRow =
    LatestRow(e.user_id, e.event_id, e.event_type, micros(e.ts),
      Math.round(e.value * 100))

  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  private def later(a: LatestRow, b: LatestRow): LatestRow =
    if (ord.gteq((a.last_ts_us, a.last_event_id),
                 (b.last_ts_us, b.last_event_id))) a else b

  private def update(userId: Long, rows: Iterator[Ev],
                     state: GroupState[LatestRow]): LatestRow = {
    val incoming = rows.map(candidate).reduce(later)
    val next = state.getOption.map(later(_, incoming)).getOrElse(incoming)
    state.update(next)
    next
  }

  /** One LatestRow per key per micro-batch that touched it (Update
    * mode); the most recent emission per key IS the current snapshot.
    */
  def latestStream(events: Dataset[Ev]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** Batch parity reference: the same winner over a bounded dataset. */
  def latestBatch(events: Dataset[Ev]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroups((_, rows) => rows.map(candidate).reduce(later))
  }

  // OutputMode sanity: mapGroupsWithState requires Update
  val outputMode: OutputMode = OutputMode.Update()
}

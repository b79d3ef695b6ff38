package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.LatestState.Ev

/** Streaming heavy hitters — the continuous flavour of q29's Count-Min
  * top talkers: per event_type, a bounded Misra-Gries summary of user
  * activity maintained in keyed state, emitting the current top-k each
  * micro-batch.
  *
  * Why Misra-Gries and not a full count map: unbounded per-key maps
  * are the streaming-state failure mode at 100 TB/day (state grows
  * with distinct users forever). MG caps the map at [[Capacity]]
  * counters with the classic guarantee: every key with true count
  * > N/Capacity survives, and each estimate undercounts by at most
  * the total decrement amount — EXACT whenever distinct keys within
  * the group stay ≤ Capacity (the parity the spec pins).
  *
  * Scale shape: state is sharded by group key across executors,
  * O(Capacity) per group regardless of stream lifetime; emissions are
  * Update-mode rows, deterministic order (count DESC, user ASC) so
  * downstream consumers and the spec see a stable top-k.
  */
object HeavyHitters {

  val Capacity = 100
  val TopK = 5

  case class HHState(counts: Map[Long, Long], decrements: Long)

  case class HHRow(event_type: String, rank: Int, user_id: Long,
                   est_count: Long, max_undercount: Long)

  /** Misra-Gries ingest of one observation into a bounded counter map. */
  private[streaming] def ingest(st: HHState, user: Long): HHState = {
    val c = st.counts
    if (c.contains(user)) st.copy(counts = c.updated(user, c(user) + 1L))
    else if (c.size < Capacity) st.copy(counts = c.updated(user, 1L))
    else {
      // decrement-all: drop zeroed counters, charge one global decrement
      val dec = c.map { case (k, v) => k -> (v - 1L) }.filter(_._2 > 0L)
      HHState(dec, st.decrements + 1L)
    }
  }

  private[streaming] def topK(eventType: String, st: HHState): Seq[HHRow] =
    st.counts.toSeq
      .sortBy { case (user, cnt) => (-cnt, user) }
      .take(TopK)
      .zipWithIndex
      .map { case ((user, cnt), i) =>
        HHRow(eventType, i + 1, user, cnt, st.decrements) }

  private def update(eventType: String, rows: Iterator[Ev],
                     state: GroupState[HHState]): Iterator[HHRow] = {
    val st0 = state.getOption.getOrElse(HHState(Map.empty, 0L))
    val st = rows.foldLeft(st0)((st, e) => ingest(st, e.user_id))
    state.update(st)
    topK(eventType, st).iterator
  }

  /** Per event_type, the current top-[[TopK]] users each micro-batch
    * (Update mode); the latest emission per (event_type, rank) is the
    * live leaderboard. */
  def topTalkers(events: Dataset[Ev]): Dataset[HHRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Batch parity reference: exact per-group top-k by (count DESC,
    * user ASC) — what the stream must equal while distinct users per
    * group ≤ [[Capacity]]. */
  def topTalkersBatch(events: Dataset[Ev]): Dataset[HHRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroups { (et, rows) =>
        val counts = rows.foldLeft(Map.empty[Long, Long]) {
          (m, e) => m.updated(e.user_id, m.getOrElse(e.user_id, 0L) + 1L)
        }
        et -> counts
      }
      .flatMap { case (et, counts) => topK(et, HHState(counts, 0L)) }
  }
}

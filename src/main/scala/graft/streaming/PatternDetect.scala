package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.LatestState.Ev

/** Streaming CEP pattern detection — "A followed by B within W" per
  * user (view → purchase inside 30 minutes): the event-correlation
  * primitive behind conversion attribution, fraud rules ("password
  * reset then transfer"), and alerting, continuous where q41/q79's
  * funnels are batch.
  *
  * Match rule (CEP "latest-A" policy): each B event matches the MOST
  * RECENT preceding A of the same user when `0 < tB − tA ≤ W`; an A
  * can serve several Bs, a newer A replaces an older one. That policy
  * is what makes the state O(1) PER USER — only the latest A is ever
  * retained, never an event buffer, so state size is (active users ×
  * a few longs) regardless of stream lifetime.
  *
  * Completeness contract: matches are exact for events ordered up to
  * the watermark (rows within a micro-batch are re-sorted by event
  * time before the fold, so intra-batch disorder is free); an A
  * arriving later than an already-processed B cannot match
  * retroactively — the same up-to-watermark contract as every
  * stateful streaming op here. State is evicted by EVENT-TIME timeout
  * at `tA + W`: after that moment no future B could match, so
  * eviction is invisible to results (the eviction-correctness twin of
  * StreamDedup's readmit tradeoff).
  */
object PatternDetect {

  val WindowMs: Long = 30 * 60 * 1000L
  val A = "view"
  val B = "purchase"

  case class PState(aId: Long, aTsMs: Long)
  case class MatchRow(user_id: Long, a_event_id: Long, b_event_id: Long,
                      lag_ms: Long)

  /** One event through the match rule: A replaces the pending state,
    * a B within the window emits against the latest A. Shared by the
    * streaming update and the batch-parity fold. */
  private[streaming] def step(st: Option[PState], e: Ev)
      : (Option[PState], Option[MatchRow]) = {
    val t = e.ts.getTime
    if (e.event_type == A) (Some(PState(e.event_id, t)), None)
    else if (e.event_type == B)
      (st, st.collect {
        case PState(aid, ta) if t > ta && t - ta <= WindowMs =>
          MatchRow(e.user_id, aid, e.event_id, t - ta)
      })
    else (st, None)
  }

  private def update(user: Long, rows: Iterator[Ev],
                     state: GroupState[PState]): Iterator[MatchRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var st = state.getOption
    val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
      val (st2, m) = step(st, e); st = st2; m
    }
    st match {
      case Some(p) =>
        val expiry = p.aTsMs + WindowMs
        if (expiry > state.getCurrentWatermarkMs()) {
          state.update(p)
          state.setTimeoutTimestamp(expiry)
        } else state.remove() // already unmatchable — evict now
      case None => if (state.exists) state.remove()
    }
    out.iterator
  }

  /** Append-mode stream of pattern matches; state bounded at one
    * (A-id, A-ts) pair per user inside the window, zero outside it. */
  def matches(events: Dataset[Ev]): Dataset[MatchRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Batch parity reference: the identical fold over each user's
    * time-ordered history — what the stream must emit given in-order
    * delivery. */
  def matchesBatch(events: Dataset[Ev]): Dataset[MatchRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (_, rows) =>
      var st: Option[PState] = None
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        val (st2, m) = step(st, e); st = st2; m
      }.iterator
    }
  }
}

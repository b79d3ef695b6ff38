package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.LatestState.Ev

/** Streaming anomaly detection — the continuous flavour of q65's
  * z-score outliers: per event_type, an O(1) exponentially-weighted
  * estimate of level and deviation maintained in keyed state, flagging
  * events that stray more than [[K]] deviation-estimates from the
  * running level.
  *
  * The estimator is the Jacobson/Karels RTT pair (SIGCOMM '88) in
  * integer cents: `ewma += (x - ewma) >> 3` (α = 1/8) and
  * `ewmad += (|x - ewma| - ewmad) >> 2` (β = 1/4). All-integer state
  * makes the fold bit-reproducible, so batch/stream parity is exact —
  * however events split across micro-batches — as long as arrival
  * order per key is preserved (the spec pins this; within one
  * micro-batch rows are re-sorted by (ts, event_id), so bounded
  * disorder inside a batch is also absorbed).
  *
  * Scale shape: state is TWO longs per key regardless of stream
  * lifetime (no window buffers, no sample reservoirs), sharded by
  * group key across executors; emissions are one row per event in
  * Append mode. The first sample seeds the level and flags nothing;
  * flags stay off until the deviation estimate warms above zero —
  * both rules are part of the pinned contract.
  */
object AnomalyEwma {

  val AlphaShift = 3 // level gain  α = 1/8
  val BetaShift  = 2 // deviation gain β = 1/4
  val K          = 4 // flag |x - ewma| > K·ewmad

  case class EwmaState(ewma: Long, ewmad: Long, seeded: Boolean)

  case class AnomRow(event_id: Long, event_type: String, value_cents: Long,
                     ewma_before: Long, ewmad_before: Long,
                     is_anomaly: Boolean)

  /** One deterministic estimator step: classify against the PRE-update
    * estimates, then fold the sample in. `>>` floors toward -∞ like
    * integer division on the non-negative deviations it sees.
    */
  private[streaming] def step(st: EwmaState, vc: Long): (EwmaState, EwmaState, Boolean) = {
    if (!st.seeded) (EwmaState(vc, 0L, seeded = true), st, false)
    else {
      val dev = math.abs(vc - st.ewma)
      val anom = st.ewmad > 0L && dev > K * st.ewmad
      val next = EwmaState(
        st.ewma + ((vc - st.ewma) >> AlphaShift),
        st.ewmad + ((dev - st.ewmad) >> BetaShift),
        seeded = true)
      (next, st, anom)
    }
  }

  private def cents(v: Double): Long = Math.round(v * 100)

  private[streaming] def foldOrdered(events: Seq[Ev]): Seq[AnomRow] = {
    var st = EwmaState(0L, 0L, seeded = false)
    events.map { e =>
      val vc = cents(e.value)
      val (next, before, anom) = step(st, vc)
      st = next
      AnomRow(e.event_id, e.event_type, vc, before.ewma, before.ewmad, anom)
    }
  }

  private def update(eventType: String, rows: Iterator[Ev],
                     state: GroupState[EwmaState]): Iterator[AnomRow] = {
    val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption.getOrElse(EwmaState(0L, 0L, seeded = false))
    val out = ordered.map { e =>
      val vc = cents(e.value)
      val (next, before, anom) = step(st, vc)
      st = next
      AnomRow(e.event_id, e.event_type, vc, before.ewma, before.ewmad, anom)
    }
    state.update(st)
    out.iterator
  }

  /** One AnomRow per event, keyed state per event_type. */
  def anomalyStream(events: Dataset[Ev]): Dataset[AnomRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Batch parity reference: the same fold over each key's events in
    * (ts, event_id) order. */
  def anomalyBatch(events: Dataset[Ev]): Dataset[AnomRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroups { (_, rows) =>
        foldOrdered(rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))).iterator
      }
  }
}

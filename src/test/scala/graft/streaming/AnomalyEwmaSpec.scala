package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.AnomalyEwma.{AnomRow, EwmaState}
import graft.streaming.LatestState.Ev

/** Contract pins for the streaming EWMA anomaly detector:
  *  - EXACT batch/stream parity across uneven micro-batch splits
  *    (integer state + in-order arrival ⇒ bit-identical folds);
  *  - a spike against a stable level is flagged, the stable samples
  *    and the warmup prefix are not;
  *  - state is two longs per key — the estimator never buffers rows.
  */
class AnomalyEwmaSpec extends SparkSpec {

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(seconds: Long) = new Timestamp(t0.getTime + seconds * 1000)
  private def ev(id: Long, et: String, v: Double) = Ev(id, at(id), 7L, et, v)

  // stable ~10.00 level with one 100.00 spike at id 30, per key
  private def series(et: String): Seq[Ev] =
    (1L to 50L).map { i =>
      val v = if (i == 30) 100.0 else 10.0 + (i % 3) * 0.02
      ev(i, et, v)
    }

  test("stream equals batch across uneven micro-batch splits") {
    val s = spark
    import s.implicits._
    val all = series("click") ++ series("view")
    val ordered = all.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, rest) = ordered.splitAt(ordered.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    val mem = MemoryStream[Ev](s)
    val q = AnomalyEwma.anomalyStream(mem.toDS())
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val streamed =
      try {
        Seq(b1, b2, b3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table("anom").as[AnomRow].collect().toSeq
      } finally q.stop()

    val batch = AnomalyEwma.anomalyBatch(s.createDataset(all)).collect().toSeq
    assert(streamed.sortBy(r => (r.event_type, r.event_id)) ===
           batch.sortBy(r => (r.event_type, r.event_id)))
  }

  test("spike is flagged; stable level and warmup are not") {
    val s = spark
    import s.implicits._
    val rows = AnomalyEwma.anomalyBatch(s.createDataset(series("click")))
      .collect().sortBy(_.event_id)
    val flagged = rows.filter(_.is_anomaly).map(_.event_id).toSet
    assert(flagged === Set(30L))
    // classification is against PRE-update estimates: the spike's row
    // carries the stable level, not one polluted by the spike itself
    val spike = rows.find(_.event_id == 30L).get
    assert(math.abs(spike.ewma_before - 1000L) < 20L)
  }

  test("estimator state is O(1): two longs, no row buffers") {
    // the fold's state after any prefix is a single EwmaState
    val evs = series("click")
    var st = EwmaState(0L, 0L, seeded = false)
    evs.foreach { e =>
      val (next, _, _) = AnomalyEwma.step(st, Math.round(e.value * 100))
      st = next
    }
    assert(st.seeded && st.ewma > 0L)
  }
}

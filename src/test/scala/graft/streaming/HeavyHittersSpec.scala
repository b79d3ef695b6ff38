package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.HeavyHitters.{HHRow, HHState}
import graft.streaming.LatestState.Ev

/** Contract pins for the streaming Misra-Gries top talkers:
  *  - EXACT batch/stream parity while distinct users per group stay
  *    ≤ Capacity, however events split across micro-batches;
  *  - the MG saturation guarantee once they don't: counters never
  *    overcount, undercount by at most `decrements`, and every user
  *    with true count > N/Capacity survives the summary.
  */
class HeavyHittersSpec extends SparkSpec {

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)
  private def ev(id: Long, user: Long, et: String) =
    Ev(id, at(id % 60), user, et, 1.0)

  test("stream top-k equals batch top-k under capacity, across batch splits") {
    val s = spark
    import s.implicits._
    // skewed counts: user u appears u times per type -> clear top-5
    val all = for {
      et <- Seq("click", "view")
      u <- 1L to 20L
      i <- 1L to u
    } yield ev(u * 100 + i, u, et)
    val (b1, b2) = all.splitAt(all.size / 3) // uneven split on purpose

    val mem = MemoryStream[Ev](s)
    val q = HeavyHitters.topTalkers(mem.toDS())
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    val streamed =
      try {
        Seq(b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // live leaderboard = latest emission per (event_type, rank);
        // with deterministic emissions per batch, the final batch's
        // rows are exactly the last TopK per type
        s.sql("""SELECT event_type, rank, user_id, est_count, max_undercount
                 FROM (SELECT *, row_number() OVER (
                         PARTITION BY event_type, rank
                         ORDER BY est_count DESC) AS rn FROM hh)
                 WHERE rn = 1""").as[HHRow].collect().toSet
      } finally q.stop()

    val expected = HeavyHitters.topTalkersBatch(s.createDataset(all)).collect().toSet
    assert(streamed == expected)
    // sanity: top user per type is u=20 with count 20, zero undercount
    assert(expected.count(_.rank == 1) == 2)
    expected.filter(_.rank == 1).foreach { r =>
      assert(r.user_id == 20L && r.est_count == 20L && r.max_undercount == 0L)
    }
  }

  test("MG saturation: bounded state, no overcount, heavy keys survive") {
    // 1 group, 300 distinct users (3x capacity): one heavy user with
    // 150 hits among 300 singletons
    val heavy = Seq.fill(150)(7777L)
    val noise = (1L to 300L).map(u => 100000L + u)
    val users = (heavy ++ noise).zipWithIndex.map { case (u, i) => (u, i) }
    val st = users.foldLeft(HHState(Map.empty, 0L)) {
      case (st, (u, _)) => HeavyHitters.ingest(st, u)
    }
    assert(st.counts.size <= HeavyHitters.Capacity, "state must stay bounded")
    // true count 150 for the heavy user; MG may undercount by at most
    // `decrements`, and never overcounts
    val est = st.counts.getOrElse(7777L, 0L)
    assert(est <= 150L, "MG must never overcount")
    assert(est >= 150L - st.decrements, "undercount bounded by decrements")
    // N/Capacity = 450/100 < 150: the heavy key must survive
    assert(st.counts.contains(7777L), "heavy hitter evicted — MG guarantee broken")
    // and it must lead the top-k
    assert(HeavyHitters.topK("g", st).head.user_id == 7777L)
  }
}

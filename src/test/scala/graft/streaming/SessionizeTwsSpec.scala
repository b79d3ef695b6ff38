package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.Sessionize.{Event, Session}

/** `transformWithState` sessionizer vs the `flatMapGroupsWithState`
  * one: same MemoryStream input, identical closed sessions.
  * transformWithState requires the RocksDB state store provider, set
  * per-query via the session conf around `start()`.
  */
class SessionizeTwsSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000)

  private val batches: Seq[Seq[Event]] = Seq(
    Seq(Event(1, at(0), "click", 1.0), Event(1, at(10), "view", 2.5),
        Event(2, at(5), "click", 10.0)),
    // crosses the 30-min gap for both users -> closes their first sessions
    Seq(Event(1, at(120), "click", 3.0), Event(2, at(125), "view", 4.0)),
    // advance watermark far enough that gap timers for t=120/125 fire
    Seq(Event(3, at(300), "click", 0.5)))

  private def runStream(
      f: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[Session],
      name: String, provider: Option[String]): Seq[Session] = {
    val s = spark
    import s.implicits._
    val prev = s.conf.getOption(ProviderKey)
    provider.foreach(s.conf.set(ProviderKey, _))
    try {
      val mem = MemoryStream[Event](s)
      val q = f(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.sql(s"SELECT * FROM $name").as[Session].collect().toSeq
          .sortBy(r => (r.user_id, r.session_start_us))
      } finally q.stop()
    } finally {
      provider.foreach { _ =>
        prev match {
          case Some(v) => s.conf.set(ProviderKey, v)
          case None => s.conf.unset(ProviderKey)
        }
      }
    }
  }

  test("transformWithState emits the same closed sessions as flatMapGroupsWithState") {
    val fmgws = runStream(Sessionize.sessionizeStream, "tws_base", None)
    val tws = runStream(SessionizeTws.sessionizeStream, "tws_new", Some(RocksDb))
    assert(fmgws.nonEmpty, "baseline closed no sessions")
    assert(tws == fmgws)
    // user 1's first session: 2 events, 100 + 250 cents
    val u1 = tws.find(_.user_id == 1).get
    assert(u1.n_events == 2 && u1.sum_cents == 350)
  }
}

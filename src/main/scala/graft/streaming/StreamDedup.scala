package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — d1's content-hash dedup as a continuous
  * operator over the events/documents stream.
  *
  * The batch reference dedups by reprocessing whole day partitions
  * (SURVEY §2.10); the streaming engine instead suppresses duplicates
  * as they arrive. The naive `dropDuplicates(hash)` keeps EVERY seen
  * key in state forever — unbounded growth, the classic streaming
  * dedup failure at 100 TB/day. `dropDuplicatesWithinWatermark` bounds
  * state to one watermark window: a key's state is dropped once the
  * event-time watermark passes its expiry, so steady-state size is
  * (arrival rate × watermark delay), independent of stream lifetime.
  *
  * The tradeoff is explicit and tested: a duplicate arriving AFTER the
  * watermark evicted its first sighting is re-admitted. That is the
  * correct production contract — cross-window dups are caught by the
  * daily batch pass (d1), the stream only needs the near-horizon
  * guarantee — and the reason this operator can run forever.
  *
  * State is sharded by the dedup key (hash), so a 1000-executor run
  * spreads it evenly; no driver-side state, no skew (md5 keys are
  * uniform by construction).
  */
object StreamDedup {

  /** First sighting of each normalized-content hash within the
    * watermark horizon. `delay` is the out-of-orderness bound, e.g.
    * "10 minutes". Append-mode safe: rows emit immediately; only the
    * suppression state waits on the watermark.
    */
  def firstSightings(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash",
        md5(regexp_replace(lower(trim(col("text"))), " +", " ")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Keyed variant: duplicates are (user_id, event_type) repeats —
    * the "same logical event delivered twice" shape an at-least-once
    * transport produces (SURVEY §2.10's Kafka consumer). */
  def dedupEvents(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
}

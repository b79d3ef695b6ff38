package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the funnel-attribution shape: each
  * click joins the views by the same user in the preceding 10 minutes.
  * The reference has no stream-stream joins (SURVEY §2.10 — late data
  * is reprocessed in day partitions); this is the Structured Streaming
  * operator that replaces that reprocess for correlation workloads.
  *
  * Both sides carry a watermark and the join condition bounds
  * `click_ts - view_ts` to [0, 10 min], so the state store retains
  * each view row only until `watermark - 10 min` passes it — state is
  * O(events in the interval window), not O(stream history), which is
  * what lets the join run indefinitely on a 1000-executor cluster.
  * Rows co-partition on `user_id` (the equi-part of the predicate), so
  * matching is executor-local after one shuffle per side.
  */
object StreamJoin {

  /** LEFT OUTER attribution: every click, matched views or null — the
    * flavor a funnel report needs when unattributed clicks are
    * themselves the signal. Outer semantics on a stream require the
    * watermark: a click emits its null-padded row only once the
    * watermark passes `click_ts + interval` and no view can still
    * arrive — so outer results trail the inner ones by exactly the
    * join tolerance, the price of correctness under out-of-order
    * input. State bounds are the same as the inner form.
    */
  def attributeClicksOuter(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    c.join(v,
      expr("""user_id = v_user AND
              click_ts >= view_ts AND
              click_ts <= view_ts + interval 10 minutes"""),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Inner attribution join: (click, matching prior view) pairs. */
  def attributeClicks(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    c.join(v,
      expr("""user_id = v_user AND
              click_ts >= view_ts AND
              click_ts <= view_ts + interval 10 minutes"""))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }
}

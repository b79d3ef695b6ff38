package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** As-of join — the time-series operator Spark lacks natively
  * (preference order (a): composed from built-ins, per the build
  * contract; a custom LogicalPlan+Strategy would only pay once the
  * composition's plan stops being good enough).
  *
  * Semantics: for each left row, the single right row with the same
  * key and the greatest `rightTime <= leftTime`. Implementation is a
  * range join on (key, rightTime ≤ leftTime) narrowed by a
  * row_number window. At 100 TB the range join's fan-out is bounded
  * by the per-key right-side history; for deep histories the
  * production variant buckets time into coarse grains joined
  * equi-first (grain, key) before the range filter, or sorts both
  * sides and merges per partition — both still built-ins.
  *
  * The right side must be unique per (key, time) for determinism —
  * callers dedupe first (the oracle's ASOF has the same tie rule
  * only after dedupe).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           key: (Column, Column), time: (Column, Column),
           rightCols: Seq[Column]): DataFrame = {
    // left rows must be distinct (true for keyed fact rows); unmatched
    // left rows survive as the single null-time row of their group
    val leftCols = left.columns.map(left(_))
    val w = Window.partitionBy(leftCols: _*).orderBy(time._2.desc)
    left.join(right, key._1 === key._2 && time._2 <= time._1, "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(leftCols ++ rightCols: _*)
  }

  /** q21 — each event joined to the user's latest order at-or-before
    * the event (orders deduped to max orderkey per (custkey, date) so
    * both engines' tie rules coincide).
    */
  val q21AsofJoin: (SparkSession, String) => DataFrame = (s, dir) => {
    val events = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
    asOf(events, orders,
      key = (col("user_id"), col("o_custkey")),
      time = (col("ts"), col("o_orderdate").cast("timestamp")),
      rightCols = Seq(col("o_orderkey").as("last_orderkey"),
        col("o_orderdate").as("last_orderdate")))
  }

  val q21AsofJoinSql: String = """
    WITH o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2)
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey,
           o.o_orderdate AS last_orderdate
    FROM events e
    ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)"""

  /** q75 — last-touch attribution: every purchase matched to the same
    * user's most recent click AT-OR-BEFORE it — the marketing-
    * attribution shape, the as-of join applied within one event
    * stream. Clicks dedupe to max event_id per (user, ts) so both
    * engines' tie rules coincide; unattributed purchases survive with
    * null click columns (the orphan signal the outer stream join also
    * surfaces). Same plan as q21: per-user range join narrowed by one
    * row_number window, fan-out bounded by per-user click history.
    */
  val q75LastTouch: (SparkSession, String) => DataFrame = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max("event_id").as("click_id"))
    asOf(purchases, clicks,
      key = (col("user_id"), col("c_user")),
      time = (col("ts"), col("c_ts")),
      rightCols = Seq(col("click_id"), col("c_ts").as("click_ts")))
  }

  val q75LastTouchSql: String = """
    WITH c AS (
      SELECT user_id AS c_user, ts AS c_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT p.event_id AS purchase_id, p.user_id, p.ts,
           c.click_id, c.c_ts AS click_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN c
      ON p.user_id = c.c_user AND p.ts >= c.c_ts"""

  /** q90 — q21's semantics through the NATIVE merge as-of operator
    * ([[graft.plans.AsOfJoinNative]]: custom logical node + planner
    * strategy + physical exec, preference order (c)): one forward
    * pass over key-clustered (key, time)-sorted sides, no candidate
    * fan-out, no window. Hash-gated against the SAME DuckDB ASOF
    * oracle as q21 — the custom physical operator is held to the
    * identical correctness bar as the composed form it replaces.
    */
  val q90AsofNative: (SparkSession, String) => DataFrame = (s, dir) => {
    val events = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("t_us", expr("unix_micros(ts)"))
    val orders = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
      .withColumn("d_us", expr("unix_micros(cast(o_orderdate as timestamp))"))
    graft.plans.AsOfJoinNative.asOf(events, orders,
      leftKey = events("user_id"), rightKey = orders("o_custkey"),
      leftTime = events("t_us"), rightTime = orders("d_us"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey").as("last_orderkey"),
        col("o_orderdate").as("last_orderdate"))
  }

  /** Same oracle as q21 — identical semantics, different physical plan. */
  val q90AsofNativeSql: String = q21AsofJoinSql
}

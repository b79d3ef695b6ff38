package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Caching.RegisterSyntax

/** Analytics extensions beyond the reference surface (SURVEY §2.5/§2.6
  * note the reference has no grouping sets, no unpivot, no
  * distribution windows): cube, unpivot/melt, fuzzy string pairs,
  * time-series gap filling, and the distribution window family. All
  * oracle-checked vs DuckDB at sf0.01.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame

  private def cents(c: Column) = round(c * 100).cast("long")

  /** q34 — CUBE over (returnflag, linestatus) with an explicit
    * grouping-bit id (`grouping(a)*2 + grouping(b)` spelled out on both
    * sides — Spark's `grouping_id()` and DuckDB's `GROUPING()` agree on
    * bit order, but the explicit form is engine-neutral). One shuffle;
    * Catalyst plans cube as an Expand (4 rows per input) + single
    * hash aggregate — no re-scan per grouping set.
    */
  val q34Cube: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"),
        (sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
        count(lit(1)).as("n"))

  val q34CubeSql: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""

  /** q35 — unpivot/melt: four lineitem measures into (metric, value)
    * rows. Narrow: Catalyst plans `unpivot` as an Expand — 4 output
    * rows per input row, zero shuffles, pipelined into the parent.
    */
  val q35Unpivot: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")

  val q35UnpivotSql: String = """
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (SELECT l_orderkey, l_linenumber,
                 l_quantity, l_extendedprice, l_discount, l_tax
          FROM lineitem)
    UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))"""

  /** q36 — fuzzy duplicate candidates: part names within levenshtein
    * distance 4, blocked on brand so the quadratic comparison is
    * bounded per block (the same block-don't-cross-join discipline as
    * d5/d6; an unblocked production form feeds d3's LSH output
    * instead). `levenshtein` is the standard DP edit distance in both
    * engines.
    */
  /** Candidate ordered name pairs for [[q36FuzzyPairs]], blocked by
    * length band — the d13-style bounded candidate generator for edit
    * distance. Two names within levenshtein distance 4 differ in
    * length by ≤ 4, so with bands 5 chars wide (threshold + 1) a
    * qualifying pair never spans more than adjacent bands: the left
    * side probes its own and both neighbor bands, the right side
    * keeps its own, and each eligible ordered pair meets on exactly
    * one key (the right name's band). DP invocations are bounded by
    * Σ_band |band|·|3 adjacent bands| — occupancy of the length
    * histogram, never vocab² — the same block-size-not-corpus bound
    * d7's df cap and d13's rarity prefix give the shingle joins.
    */
  private[graft] def q36NamePairs(names: DataFrame): DataFrame = {
    val n = names.withColumn("len", length(col("p_name")))
    val left = n.select(col("p_name").as("na"), col("len").as("la"),
      explode(expr(
        "array(len div 5 - 1, len div 5, len div 5 + 1)")).as("band"))
    val right = n.select(col("p_name").as("nb"), col("len").as("lb"),
      expr("len div 5").as("band"))
    left.join(right, "band")
      .filter(abs(col("la") - col("lb")) <= 4)
      .select("na", "nb")
  }

  val q36FuzzyPairs: Q = (s, dir) => {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand", "p_name")
    // The string vocabulary is tiny relative to the table (64 distinct
    // names across 20k parts at sf0.1), so the edit-distance DP runs
    // over candidate name pairs — NOT row pairs — and the row-level
    // work is two hash joins proportional to the OUTPUT size.
    // Candidates come length-band-blocked from [[q36NamePairs]]; the
    // banded 3-arg levenshtein stops at the threshold (O(k·n) per
    // pair); `dist >= 0` keeps exactly the pairs within it. The
    // name-pair table keeps both orders + self-pairs because part
    // pairs order on partkey, not on name.
    val names = p.select("p_name").distinct()
    val np = q36NamePairs(names)
      .filter(levenshtein(col("na"), col("nb"), 4) >= 0)
      .withColumn("dist", levenshtein(col("na"), col("nb")))
    p.as("a")
      .join(broadcast(np), col("a.p_name") === col("na"))
      .join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
        col("nb") === col("b.p_name") &&
        col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("part_a"), col("b.p_partkey").as("part_b"),
        col("na").as("name_a"), col("nb").as("name_b"), col("dist"))
  }

  val q36FuzzyPairsSql: String = """
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4"""

  /** q37 — time-series gap filling: hourly event counts per type with
    * missing hours zero-filled. The hour spine is `sequence()` exploded
    * from one global min/max row (a 1-row cross join, broadcast — not
    * a driver-side loop); real counts left-join onto the spine. The
    * monitoring notebook's count matrix (SURVEY §2.5 A6) needs exactly
    * this to distinguish "no data" from "missing load".
    */
  val q37GapFill: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("n"))
    val hours = ev.agg(min("h").as("h0"), max("h").as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val types = ev.select("event_type").distinct()
    types.crossJoin(hours)
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  val q37GapFillSql: String = """
    WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
    counts AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
    types AS (SELECT DISTINCT event_type FROM ev)
    SELECT types.event_type, hours.h, coalesce(counts.n, 0) AS n
    FROM types CROSS JOIN hours
    LEFT JOIN counts ON counts.event_type = types.event_type AND counts.h = hours.h"""

  /** q38 — distribution windows: percent_rank / cume_dist / ntile(4)
    * of order value within each customer (unique tie-break on
    * orderkey so ranks are deterministic). Completes the window-family
    * surface next to q5 (row_number) and q23 (lag/lead/dense_rank/
    * frame sums). Both engines compute percent_rank as
    * (rank-1)/(n-1) in IEEE double — bit-exact.
    */
  val q38DistWindows: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"))
  }

  val q38DistWindowsSql: String = """
    SELECT o_custkey, o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)"""

  /** q41 — funnel conversion: per user, clicks that follow a view
    * within 10 minutes (attributed) and are themselves followed by a
    * purchase within 30 minutes (converted). The batch analog of the
    * stream-stream interval join ([[graft.streaming.StreamJoin]]):
    * each stage is a LEFT SEMI range join — the semi form dedups
    * multi-match fan-out before counting, and each join's equi-part
    * (user_id) carries the shuffle while the time band is a post-match
    * predicate. At scale both stages are one co-partitioned shuffle
    * each; no window sorts.
    */
  val q41Funnel: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    def typed(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = typed("click")
    val views = typed("view").select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val purchases = typed("purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val attributed = clicks.join(views,
      col("user_id") === col("v_user") &&
      col("v_ts") <= col("ts") &&
      col("v_ts") >= col("ts") - expr("interval 10 minutes"), "left_semi")
    val converted = attributed.join(purchases,
      col("user_id") === col("p_user") &&
      col("p_ts") >= col("ts") &&
      col("p_ts") <= col("ts") + expr("interval 30 minutes"), "left_semi")
    def cnt(df: DataFrame, as: String) =
      df.groupBy("user_id").agg(count(lit(1)).as(as))
    cnt(clicks, "n_clicks")
      .join(cnt(attributed, "n_attributed"), Seq("user_id"), "left")
      .join(cnt(converted, "n_converted"), Seq("user_id"), "left")
      .select(col("user_id"), col("n_clicks"),
        coalesce(col("n_attributed"), lit(0L)).as("n_attributed"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"))
  }

  val q41FunnelSql: String = """
    WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    a AS (SELECT * FROM c WHERE EXISTS (
            SELECT 1 FROM events v
            WHERE v.event_type = 'view' AND v.user_id = c.user_id
              AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 10 MINUTE)),
    cv AS (SELECT * FROM a WHERE EXISTS (
            SELECT 1 FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = a.user_id
              AND p.ts >= a.ts AND p.ts <= a.ts + INTERVAL 30 MINUTE))
    SELECT c.user_id,
           count(*) AS n_clicks,
           coalesce((SELECT count(*) FROM a WHERE a.user_id = c.user_id), 0) AS n_attributed,
           coalesce((SELECT count(*) FROM cv WHERE cv.user_id = c.user_id), 0) AS n_converted
    FROM c GROUP BY c.user_id"""

  /** q42 — cohort retention: users bucketed by first-activity week,
    * then distinct active users per (cohort, week) — the product-
    * analytics matrix behind every retention dashboard. Two shuffles
    * (first-week per user, then the cohort×week distinct count);
    * weeks are integer `floor(days-since-epoch-start / 7)` so both
    * engines bucket identically with no timezone/week-start ambiguity.
    */
  val q42CohortRetention: Q = (s, dir) => {
    val weeks = Tables.load(s, dir, "events")
      .select(col("user_id"),
        floor(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) / 7)
          .as("week"))
    val cohort = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeks.distinct()
      .join(cohort, "user_id")
      .groupBy("cohort_week", "week")
      .agg(countDistinct("user_id").as("n_active"))
      .withColumn("weeks_since", (col("week") - col("cohort_week")).cast("long"))
  }

  val q42CohortRetentionSql: String = """
    WITH w AS (
      SELECT user_id,
             CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
      FROM events),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1),
    active AS (SELECT DISTINCT user_id, week FROM w)
    SELECT cohort_week, week, count(DISTINCT active.user_id) AS n_active,
           CAST(week - cohort_week AS BIGINT) AS weeks_since
    FROM active JOIN cohort USING (user_id)
    GROUP BY cohort_week, week"""

  /** q44 — explicit GROUPING SETS (completes the rollup/cube family:
    * q18 rollup, q34 cube): per-returnflag and per-linestatus marginals
    * plus the grand total, WITHOUT the cross cells cube would add.
    * Catalyst plans this as one Expand (3 rows per input) + a single
    * hash aggregate — one shuffle, no per-set re-scan, same as cube.
    */
  val q44GroupingSets: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(cents(col("l_quantity"))).as("qty_cents"))

  val q44GroupingSetsSql: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""

  /** q45 — keep-latest-per-key (log compaction / CDC snapshot): the
    * current state of every user from the append-only event log.
    * Implemented as a single `max_by` aggregation ordered by the unique
    * (ts, event_id) pair — ONE shuffle with map-side partial
    * aggregation (each task forwards one candidate row per key), where
    * the textbook `row_number() = 1` window would sort every
    * partition's full history. At 100 TB of events this is the
    * difference between shuffling |users| rows and |events| rows.
    */
  val q45LatestPerKey: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"), cents(col("value")).as("cents"))
      .groupBy("user_id")
      .agg(expr(
        """max_by(named_struct('event_id', event_id, 'event_type', event_type,
                               'us', us, 'cents', cents),
                  named_struct('us', us, 'event_id', event_id))""").as("last"))
      .select(col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.us").as("last_ts_us"),
        col("last.cents").as("last_value_cents"))

  val q45LatestPerKeySql: String = """
    WITH r AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CAST(round(value*100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           us AS last_ts_us, cents AS last_value_cents
    FROM r WHERE rn = 1"""

  /** q46 — conditional (FILTER-clause) aggregation: one scan of orders
    * producing per-priority totals sliced three ways by status. The
    * conditional sums stay inside one codegen'd hash aggregate — the
    * alternative (three filtered scans unioned back) reads the table
    * three times. Null-sum-on-empty is pinned to 0 with coalesce on
    * both engines.
    */
  val q46FilteredAgg: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_fulfilled"),
        coalesce(sum(when(col("o_orderstatus") === "O",
          cents(col("o_totalprice")))), lit(0L)).as("open_cents"),
        coalesce(sum(when(col("o_orderstatus") === "P",
          cents(col("o_totalprice")))), lit(0L)).as("partial_cents"))

  val q46FilteredAggSql: String = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_fulfilled,
           CAST(COALESCE(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS open_cents,
           CAST(COALESCE(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS partial_cents
    FROM orders GROUP BY o_orderpriority"""

  /** q47 — RANGE-frame sliding aggregate: for every event, the user's
    * activity (count + cents) over the TRAILING HOUR — the "rate over
    * sliding window" shape q26's tumbling windows can't express (no
    * bucket boundary effects) and q23's ROWS frames can't either
    * (row-count frames ignore time gaps). One shuffle on user_id; the
    * range frame is evaluated over each partition's sorted run with a
    * moving two-pointer, O(n) per user — no self-join, no explode of
    * per-minute buckets.
    */
  val q47SlidingRange: Q = (s, dir) => {
    val HourUs = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-HourUs, 0)
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"), cents(col("value")).as("cents"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .withColumn("cents_trailing_1h", sum("cents").over(w).cast("long"))
  }

  val q47SlidingRangeSql: String = """
    SELECT event_id, user_id, epoch_us(ts) AS us,
           CAST(round(value*100) AS BIGINT) AS cents,
           count(*) OVER w AS n_trailing_1h,
           CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT)
             AS cents_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""

  /** q49 — share-of-total (ratio_to_report): each order's fraction of
    * its priority class's revenue. A whole-partition window frame (no
    * ORDER BY → no sort needed beyond the hash partition; Catalyst
    * plans Window with an unbounded frame over the partition) — the
    * denominator is computed once per partition, not per row, and the
    * share division is the same IEEE double op on identical int64
    * cents in both engines.
    */
  val q49ShareOfTotal: Q = (s, dir) => {
    val w = Window.partitionBy("o_orderpriority")
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("priority_cents", sum("cents").over(w).cast("long"))
      .withColumn("share",
        col("cents").cast("double") / col("priority_cents").cast("double"))
  }

  val q49ShareOfTotalSql: String = """
    SELECT o_orderkey, o_orderpriority,
           CAST(round(o_totalprice*100) AS BIGINT) AS cents,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                OVER (PARTITION BY o_orderpriority) AS BIGINT) AS priority_cents,
           CAST(round(o_totalprice*100) AS BIGINT)::DOUBLE /
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                  OVER (PARTITION BY o_orderpriority) AS BIGINT)::DOUBLE AS share
    FROM orders"""

  /** q56 — time-weighted aggregation: each event's value weighted by
    * how long it was "current" (gap to the user's next event). The gap
    * comes from one `lead` window per user — millisecond-exact int64
    * arithmetic (`unix_millis` / `epoch_ms`), value in cents, and the
    * division deferred to the caller so the oracle compare stays
    * integer-exact. Last event per user has no successor and drops out
    * of both sums identically on both engines. One sort-within-user
    * window, one grouped agg reusing the same partitioning — Catalyst
    * plans the groupBy(user_id) directly on the window's hash
    * partitioning, so this is ONE shuffle end to end.
    */
  val q56TimeWeighted: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        cents(col("value")).as("vc"))
      .withColumn("gap_ms", unix_millis(lead(col("ts"), 1).over(w)) -
        unix_millis(col("ts")))
      .filter(col("gap_ms").isNotNull)
      .groupBy("user_id")
      .agg(sum(col("vc") * col("gap_ms")).as("weighted_cents_ms"),
           sum(col("gap_ms")).as("total_ms"),
           count(lit(1)).as("n_gaps"))
  }

  val q56TimeWeightedSql: String = """
    WITH g AS (
      SELECT user_id,
             CAST(round(value*100) AS BIGINT) AS vc,
             epoch_ms(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_ms(ts) AS gap_ms
      FROM events)
    SELECT user_id,
           CAST(SUM(vc * gap_ms) AS BIGINT) AS weighted_cents_ms,
           CAST(SUM(gap_ms) AS BIGINT) AS total_ms,
           COUNT(*) AS n_gaps
    FROM g WHERE gap_ms IS NOT NULL
    GROUP BY user_id"""

  /** q65 — statistical anomaly detection: events more than 2.5 sample
    * standard deviations from their user's mean. The per-user moments
    * (n, Σx, Σx²) are EXACT long-cents sums out of one groupBy; the
    * z-test runs as `(n·x − S)²·(n−1) > t²·n·(n·Q − S²)` — the
    * cross-multiplied square of the z-score — evaluated in double over
    * those exact longs, so both engines compare identical IEEE values
    * (no streaming variance, no order sensitivity, no sqrt). Plan: one
    * shuffle for the moments (|users| rows), then a join back that at
    * scale co-partitions with the aggregate on user_id; the threshold
    * t=2.5 is cleared of denominators so no division happens at all.
    */
  val q65AnomalyZscore: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), cents(col("value")).as("vc"))
    val moments = ev.groupBy(col("user_id").as("uk"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("s"),
           sum(col("vc") * col("vc")).as("q"))
      .filter(col("n") >= 2)
    ev.join(moments, col("user_id") === col("uk"))
      .filter(
        (col("n") * col("vc") - col("s")).cast("double") *
        (col("n") * col("vc") - col("s")).cast("double") *
        (col("n") - 1).cast("double") >
        lit(6.25) * col("n").cast("double") *
        (col("n") * col("q") - col("s") * col("s")).cast("double"))
      .select("event_id", "user_id", "vc", "n", "s", "q")
  }

  val q65AnomalyZscoreSql: String = """
    WITH ev AS (
      SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS vc
      FROM events),
    m AS (
      SELECT user_id AS uk, COUNT(*) AS n,
             CAST(SUM(vc) AS BIGINT) AS s,
             CAST(SUM(vc * vc) AS BIGINT) AS q
      FROM ev GROUP BY 1 HAVING COUNT(*) >= 2)
    SELECT event_id, user_id, vc, n, s, q
    FROM ev JOIN m ON user_id = uk
    WHERE CAST(n * vc - s AS DOUBLE) * CAST(n * vc - s AS DOUBLE)
            * CAST(n - 1 AS DOUBLE)
          > 6.25 * CAST(n AS DOUBLE) * CAST(n * q - s * s AS DOUBLE)"""

  /** q66 — winsorized robust mean: per market segment, clamp account
    * balances into the [p05, p95] window before averaging — the robust
    * stat a quality-gate pipeline uses where a plain mean chases
    * outliers. The percentile bounds use the same linear-interpolation
    * definition in both engines (q24's discipline); the clamped value
    * is re-quantized to cents BEFORE summing so the mean is an exact
    * long sum divided once. Plan: two passes over a |customers| table
    * — a grouped percentile then a broadcast join back — both keyed on
    * the low-cardinality segment.
    */
  val q66WinsorizedMean: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_mktsegment"), cents(col("c_acctbal")).as("vc"))
    val bounds = c.groupBy(col("c_mktsegment").as("seg"))
      .agg(expr("percentile(vc, 0.05)").as("lo"),
           expr("percentile(vc, 0.95)").as("hi"))
    c.join(broadcast(bounds), col("c_mktsegment") === col("seg"))
      .select(col("c_mktsegment"),
        round(greatest(col("lo"), least(col("hi"), col("vc").cast("double"))))
          .cast("long").as("wc"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
           sum(col("wc")).as("winsorized_cents"))
      .withColumn("winsorized_mean",
        col("winsorized_cents").cast("double") / col("n_cust").cast("double")
          / 100.0)
  }

  val q66WinsorizedMeanSql: String = """
    WITH c AS (
      SELECT c_mktsegment, CAST(round(c_acctbal*100) AS BIGINT) AS vc
      FROM customer),
    b AS (
      SELECT c_mktsegment AS seg,
             quantile_cont(vc, 0.05) AS lo,
             quantile_cont(vc, 0.95) AS hi
      FROM c GROUP BY 1),
    w AS (
      SELECT c_mktsegment,
             CAST(round(greatest(lo, least(hi, CAST(vc AS DOUBLE)))) AS BIGINT) AS wc
      FROM c JOIN b ON c_mktsegment = seg)
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           CAST(SUM(wc) AS BIGINT) AS winsorized_cents,
           CAST(SUM(wc) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS winsorized_mean
    FROM w GROUP BY c_mktsegment"""

  /** q71 — MAD (median-absolute-deviation) outlier detection: the
    * robust companion to q65's z-score — a single extreme value moves
    * a mean/stddev arbitrarily but barely moves the median, so MAD
    * flags outliers even in contaminated data. Exactness: balances
    * quantize to cents (longs); the median of longs interpolates to
    * exact halves, absolute deviations are then exact multiples of
    * 0.5, and THEIR median is an exact quarter — every intermediate is
    * representable, so both engines compare identical doubles and the
    * 3·MAD test cannot drift. Two grouped percentile passes (segment-
    * keyed, |segments| rows broadcast back); nothing shuffles twice.
    */
  val q71MadOutliers: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_mktsegment"), cents(col("c_acctbal")).as("vc"))
    val med = c.groupBy(col("c_mktsegment").as("seg1"))
      .agg(expr("percentile(vc, 0.5)").as("med"))
    val dev = c.join(broadcast(med), col("c_mktsegment") === col("seg1"))
      .withColumn("dev", abs(col("vc").cast("double") - col("med")))
    val mad = dev.groupBy(col("c_mktsegment").as("seg2"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), col("c_mktsegment") === col("seg2"))
      .groupBy("c_mktsegment")
      .agg(first(col("med")).as("med_cents"),
           first(col("mad")).as("mad_cents"),
           count(lit(1)).as("n_cust"),
           sum(when(col("dev") > col("mad") * 3.0, 1L).otherwise(0L))
             .as("n_outliers"))
  }

  val q71MadOutliersSql: String = """
    WITH c AS (
      SELECT c_mktsegment, CAST(round(c_acctbal*100) AS BIGINT) AS vc
      FROM customer),
    med AS (SELECT c_mktsegment AS seg1, quantile_cont(vc, 0.5) AS med
            FROM c GROUP BY 1),
    dev AS (SELECT c_mktsegment, abs(CAST(vc AS DOUBLE) - med) AS dev, med
            FROM c JOIN med ON c_mktsegment = seg1),
    mad AS (SELECT c_mktsegment AS seg2, quantile_cont(dev, 0.5) AS mad
            FROM dev GROUP BY 1)
    SELECT c_mktsegment,
           any_value(med) AS med_cents,
           any_value(mad) AS mad_cents,
           COUNT(*) AS n_cust,
           CAST(SUM(CASE WHEN dev > mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON c_mktsegment = seg2
    GROUP BY c_mktsegment"""

  /** q72 — RFM segmentation: the classic customer-value analytics —
    * recency (days since last order, against the corpus's max date so
    * the query is reproducible), frequency (order count), monetary
    * (lifetime cents) — each cut into quintiles by `ntile(5)`, with
    * custkey tie-breaks making every bucket boundary deterministic
    * (ntile's floor-based bucket sizing is the same in both engines
    * ONLY once the order is total). Plan: one groupBy(custkey) over
    * orders, one broadcast anchor row, then three quintile passes via
    * [[graft.ops.DistributedRank.withNtile]] — each a RANGE
    * repartition + arithmetic bucket, never the partition-less ntile
    * window whose `Exchange SinglePartition` would sort the whole
    * customer grain on one task at 100 TB (the round-4 audit
    * finding); the composite segment string is the tier label a
    * marketing mart stores.
    */
  val q72Rfm: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val anchor = o.agg(max(col("o_orderdate")).as("maxd"))
    // r14: a branch-parallel variant (three independent rank pipelines
    // over a cached base, joined back on o_custkey) was measured and
    // REJECTED — 1.59 s → 2.83 s at sf0.1: the three join exchanges +
    // the per-cold-run cache materialization cost more than the
    // chained form's serial barriers save, and AQE materializes the
    // "independent" branches stage-by-stage anyway.
    val perCust = o.groupBy("o_custkey")
      .agg(max(col("o_orderdate")).as("last_order"),
           count(lit(1)).as("frequency"),
           sum(cents(col("o_totalprice"))).as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("maxd"), col("last_order")).cast("long"))
    def tile(df: DataFrame, c: String, asc: Boolean, out: String) =
      graft.ops.DistributedRank.withNtile(df, 5,
        Seq(if (asc) col(c).asc else col(c).desc, col("o_custkey")), out)
    val scored = tile(tile(tile(perCust,
      "recency_days", asc = true, "r_score"),
      "frequency", asc = false, "f_score"),
      "monetary_cents", asc = false, "m_score")
    scored
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        col("r_score").cast("long").as("r_score"),
        col("f_score").cast("long").as("f_score"),
        col("m_score").cast("long").as("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
  }

  val q72RfmSql: String = """
    WITH pc AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS monetary_cents
      FROM orders GROUP BY 1),
    a AS (SELECT max(o_orderdate) AS maxd FROM orders),
    scored AS (
      SELECT o_custkey,
             CAST(date_diff('day', last_order, maxd) AS BIGINT) AS recency_days,
             frequency, monetary_cents,
             ntile(5) OVER (ORDER BY date_diff('day', last_order, maxd), o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score
      FROM pc CROSS JOIN a)
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           r_score || '' || f_score || '' || m_score AS segment
    FROM scored"""

  /** q74 — year-over-year growth: yearly revenue with lag(1) deltas
    * and growth in basis points (exact-cents cross-multiplied — the
    * ratio divides two exact longs). The lag window runs over the
    * |years|-row aggregate, not the fact table; at 100 TB this is one
    * partial-final aggregate plus a window over a handful of rows.
    */
  val q74YoyGrowth: Q = (s, dir) => {
    val yearly = Tables.load(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"),
           count(lit(1)).as("n_orders"))
    val w = Window.orderBy("o_year")
    yearly
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .withColumn("delta_cents", col("rev_cents") - col("prev_cents"))
      // round(), not a floor/truncate cast: growth can be NEGATIVE and
      // Spark's double→long cast truncates toward zero while DuckDB's
      // // floors toward -inf — round() is symmetric in both engines
      .withColumn("growth_bp",
        when(col("prev_cents").isNotNull,
          round((col("rev_cents") - col("prev_cents")).cast("double") *
            10000.0 / col("prev_cents").cast("double")).cast("long")))
      .select("o_year", "rev_cents", "n_orders", "prev_cents",
        "delta_cents", "growth_bp")
  }

  val q74YoyGrowthSql: String = """
    WITH y AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1)
    SELECT o_year, rev_cents, n_orders,
           lag(rev_cents, 1) OVER (ORDER BY o_year) AS prev_cents,
           rev_cents - lag(rev_cents, 1) OVER (ORDER BY o_year) AS delta_cents,
           CASE WHEN lag(rev_cents, 1) OVER (ORDER BY o_year) IS NOT NULL
                THEN CAST(round(CAST(rev_cents - lag(rev_cents, 1) OVER (ORDER BY o_year) AS DOUBLE)
                          * 10000.0 / CAST(lag(rev_cents, 1) OVER (ORDER BY o_year) AS DOUBLE)) AS BIGINT)
           END AS growth_bp
    FROM y"""

  /** q76 — inter-event gap distribution: per event type, the p50/p90/
    * p99 of the millisecond gap between a user's consecutive events of
    * that type — the latency/cadence profile an eventing system
    * monitors (rising p99 gaps = a stalling producer). Gaps come from
    * one lead() per (user, type) partition; percentiles interpolate
    * over exact int64 milliseconds (q24's discipline). One shuffle for
    * the window, one |types|-row aggregate reusing nothing wider.
    */
  val q76GapPercentiles: Q = (s, dir) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_ms",
        unix_millis(lead(col("ts"), 1).over(w)) - unix_millis(col("ts")))
      .filter(col("gap_ms").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_ms, 0.5)").as("p50_ms"),
        expr("percentile(gap_ms, 0.9)").as("p90_ms"),
        expr("percentile(gap_ms, 0.99)").as("p99_ms"))
  }

  val q76GapPercentilesSql: String = """
    WITH g AS (
      SELECT event_type,
             epoch_ms(lead(ts, 1) OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id))
               - epoch_ms(ts) AS gap_ms
      FROM events)
    SELECT event_type, COUNT(*) AS n_gaps,
           quantile_cont(gap_ms, 0.5) AS p50_ms,
           quantile_cont(gap_ms, 0.9) AS p90_ms,
           quantile_cont(gap_ms, 0.99) AS p99_ms
    FROM g WHERE gap_ms IS NOT NULL
    GROUP BY event_type"""


  /** q79 — ordered funnel WITHIN a session: per (user, session) the
    * funnel depth of view → click → purchase where each later stage
    * must happen strictly after the earlier one INSIDE the same
    * 30-minute-gap session. Composes q17's gaps-and-islands
    * sessionization with q41's staged-min funnel — the question a
    * product team actually asks ("did the user convert in that
    * visit"), which neither alone answers.
    *
    * Single linear pipeline, ZERO joins, no persist (the r4 version
    * staged three aggregates over two session-keyed joins off a
    * cached frame): the staged mins become RUNNING conditional mins
    * over the session-grain window, because the strict `us > t1` /
    * `us > t2` gates only ever look BACKWARD in event-time order —
    * at any click row, the session-global min view time equals the
    * running min over rows at or before it (any smaller view
    * timestamp sorts earlier; an equal-timestamp view can't pass the
    * strict gate either way), and identically for purchases vs valid
    * clicks ('click' < 'purchase' in the tie order, so a same-us
    * valid click is included and the strict gate still rejects).
    * Shuffles: one by user_id (sessionize), one by (user_id, sid) —
    * the two stacked windows share the second sort, and the final
    * groupBy(user_id, sid) is exchange-free on the window's hash
    * partitioning.
    */
  val q79SessionFunnel: Q = (s, dir) => {
    val gap = graft.streaming.Sessionize.GapUs
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_type")
    val wSess = Window.partitionBy("user_id", "sid")
      .orderBy("us", "event_type")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("prev", lag("us", 1).over(wOrd))
      .withColumn("brk",
        when(col("prev").isNull || col("us") - col("prev") > gap, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "sid", "event_type", "us")
      .withColumn("rv",
        min(when(col("event_type") === "view", col("us"))).over(wSess))
      .withColumn("c2",
        when(col("event_type") === "click" && col("us") > col("rv"), col("us")))
      .withColumn("rc", min(col("c2")).over(wSess))
      .withColumn("c3",
        when(col("event_type") === "purchase" && col("us") > col("rc"), col("us")))
      .groupBy("user_id", "sid")
      .agg(min(when(col("event_type") === "view", col("us"))).as("t1"),
           min(col("c2")).as("t2"),
           min(col("c3")).as("t3"))
      .select(col("user_id"), col("sid"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("depth"))
  }

  val q79SessionFunnelSql: String = """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_type) AS prev
      FROM events),
    g AS (
      SELECT user_id, event_type, us,
             CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_type
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM e),
    s1 AS (SELECT user_id, sid,
                  min(CASE WHEN event_type = 'view' THEN us END) AS t1
           FROM g GROUP BY 1, 2),
    s2 AS (SELECT g.user_id, g.sid, t1,
                  min(CASE WHEN event_type = 'click' AND us > t1 THEN us END) AS t2
           FROM g JOIN s1 ON g.user_id = s1.user_id AND g.sid = s1.sid
           GROUP BY 1, 2, 3),
    s3 AS (SELECT g.user_id, g.sid, t1, t2,
                  min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END) AS t3
           FROM g JOIN s2 ON g.user_id = s2.user_id AND g.sid = s2.sid
           GROUP BY 1, 2, 3, 4)
    SELECT user_id, sid,
           CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS depth
    FROM s3"""

  /** q80 — decile lift / gains table: customers ranked by lifetime
    * spend into decile buckets, with per-decile and cumulative
    * revenue in exact cents — the marketing "top decile drives X% of
    * revenue" table. Deciles come from
    * [[graft.ops.DistributedRank.withNtile]] (range repartition +
    * arithmetic bucket — exact ntile semantics, no single-task global
    * sort of the customer grain), deterministic under the TOTAL order
    * (spend desc, custkey): both engines distribute the remainder to
    * the leading buckets identically. The one remaining
    * SinglePartition window is the cumulative sum over the 10
    * aggregated decile rows — bounded by the bucket count, not data.
    */
  val q80DecileLift: Q = (s, dir) => {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val spend = Tables.load(s, dir, "orders")
      .groupBy("o_custkey").agg(sum(cents).as("cents"))
    val d = graft.ops.DistributedRank.withNtile(spend, 10,
      Seq(col("cents").desc, col("o_custkey")), "decile")
    d.groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"))
      .withColumn("cum_cents", sum("cents").over(
        Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  val q80DecileLiftSql: String = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    d AS (SELECT o_custkey, cents,
                 ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
          FROM spend)
    SELECT decile, count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(sum(sum(cents)) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
    FROM d GROUP BY decile"""

  // =========================================================================
  // q81 — position-based multi-touch attribution (40/20/40)
  // =========================================================================

  /** Each purchase credits the clicks in its trailing 7-day window:
    * first touch 40%, last touch 40%, middles share 20% — the standard
    * U-shaped attribution model, complementing q75's last-touch as-of
    * join. Credit is integer BASIS POINTS with a deterministic
    * remainder rule (middle leftover goes to the earliest middle), so
    * the per-purchase credits sum to exactly 10000 and the DuckDB twin
    * hash-matches — no float splits.
    *
    * Scale shape: one user-keyed equi-join with a time-range predicate
    * (clicks per user per week are session-bounded, so fan-out is a
    * data-model constant, the q25 range-join argument), then one
    * per-purchase window for position — both ride the same hash
    * partitioning.
    */
  val q81MultiTouch: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(s, dir, "events")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val w = Window.partitionBy("purchase_id").orderBy(col("c_ts"), col("click_id"))
    val wAll = Window.partitionBy("purchase_id")
    purch.join(clicks,
        col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 7 DAY"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("credit_bp",
        when(col("n") === 1, 10000L)
          .when(col("n") === 2, 5000L)
          .when(col("rn") === 1 || col("rn") === col("n"), 4000L)
          .otherwise(expr("2000 div (n - 2)") +
            when(col("rn") === 2, expr("2000 % (n - 2)")).otherwise(lit(0L))))
      .select("purchase_id", "user_id", "click_id", "rn", "n", "credit_bp")
  }

  val q81MultiTouchSql: String = """
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
      FROM events WHERE event_type = 'click'),
    j AS (
      SELECT purchase_id, user_id, click_id,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY c_ts, click_id) AS rn,
             count(*) OVER (PARTITION BY purchase_id) AS n
      FROM p JOIN c ON user_id = c_user
       AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 7 DAY)
    SELECT purchase_id, user_id, click_id, rn, n,
           CAST(CASE WHEN n = 1 THEN 10000
                WHEN n = 2 THEN 5000
                WHEN rn = 1 OR rn = n THEN 4000
                ELSE 2000 // (n - 2)
                     + CASE WHEN rn = 2 THEN 2000 % (n - 2) ELSE 0 END
           END AS BIGINT) AS credit_bp
    FROM j"""

  /** q82 — first-order Markov transition matrix over each user's
    * event stream: P(next event type | current), in integer basis
    * points. The per-user ordering window shuffles once on `user_id`
    * (fully parallel — each user's sequence is independent, the
    * standard clickstream-model shape); the transition matrix itself
    * is |event types|² rows, so the per-source normalizing window runs
    * over a constant-bounded frame. Row probabilities use integer
    * basis points (`10000·n div total`) so the matrix hash-matches
    * DuckDB exactly; DuckDB's windowed SUM widens to HUGEINT, hence
    * the explicit BIGINT cast in the oracle.
    */
  val q82MarkovTransitions: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.load(s, dir, "events")
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    trans
      .withColumn("from_total",
        sum("n_transitions").over(Window.partitionBy("from_type")))
      .withColumn("prob_bp", expr("(10000 * n_transitions) div from_total"))
      .select("from_type", "to_type", "n_transitions", "prob_bp")
  }

  val q82MarkovTransitionsSql: String = """
    WITH t AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    c AS (
      SELECT from_type, to_type, count(*) AS n_transitions
      FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n_transitions,
           CAST((10000 * n_transitions)
                // SUM(n_transitions) OVER (PARTITION BY from_type)
             AS BIGINT) AS prob_bp
    FROM c"""

  /** q83 — exact percentiles WITHOUT value buffers: order-to-ship
    * SLA days by order priority via the bounded-domain histogram
    * method. q76's `percentile()` aggregate is exact but buffers every
    * value per group on one executor — the 100 TB failure mode. Here
    * the value domain is small by nature (lag in whole days), so the
    * plan aggregates to a bounded (priority × day) histogram first,
    * takes cumulative counts over that ≤~200-row-per-priority frame,
    * and reads each quantile as the first day whose cumulative count
    * reaches ceil(q·n) — the nearest-rank definition, all-integer,
    * hash-exact. Shuffle carries histogram cells, never rows.
    */
  val q83SlaPercentiles: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.loadParallel(s, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
    val o = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val hist = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days", datediff(col("l_shipdate"), col("o_orderdate")))
      .groupBy(col("o_orderpriority").as("priority"), col("lag_days"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("priority").orderBy("lag_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy("priority")))
    cum.groupBy("priority")
      .agg(max(col("n")).as("n_lineitems"),
        min(when(col("cum") * 2 >= col("n"), col("lag_days"))).as("p50_days"),
        min(when(col("cum") * 10 >= col("n") * 9, col("lag_days"))).as("p90_days"),
        min(when(col("cum") * 100 >= col("n") * 99, col("lag_days"))).as("p99_days"))
  }

  val q83SlaPercentilesSql: String = """
    WITH h AS (
      SELECT o_orderpriority AS priority,
             date_diff('day', o_orderdate, l_shipdate) AS lag_days,
             count(*) AS cnt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    c AS (
      SELECT priority, lag_days, cnt,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY lag_days
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY priority) AS n
      FROM h)
    SELECT priority,
           CAST(MAX(n) AS BIGINT) AS n_lineitems,
           MIN(CASE WHEN cum * 2 >= n THEN lag_days END) AS p50_days,
           MIN(CASE WHEN cum * 10 >= n * 9 THEN lag_days END) AS p90_days,
           MIN(CASE WHEN cum * 100 >= n * 99 THEN lag_days END) AS p99_days
    FROM c GROUP BY priority"""

  /** q84 — ANALYZE-style table statistics in ONE pass: per column of
    * `orders`, the row count, null count, and exact NDV — the numbers
    * a cost-based planner feeds its broadcast/join-order decisions
    * (and the engine's own `q22` KMV sketch approximates when exact
    * NDV is too expensive). All N distinct aggregates run in a single
    * scan — Catalyst compiles multi-distinct into one Expand (each row
    * fans out once per column) + one aggregate, not N table scans;
    * the result unpivots to the (column, stats) grain with `stack`.
    * At 100 TB you'd swap exact NDV for the KMV/HLL sketch column by
    * column; the one-scan shape is identical.
    */
  val q84TableStats: Q = (s, dir) => {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        countDistinct(col(c)).as(s"ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")))
    val one = Tables.load(s, dir, "orders").agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c => s"'$c', ndv_$c, nulls_$c").mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.size}, $stackExpr) AS (column_name, ndv, n_nulls)")
      .select("column_name", "n_rows", "ndv", "n_nulls")
  }

  val q84TableStatsSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggSelects = cols.map(c =>
      s"count(DISTINCT $c) AS ndv_$c, CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c")
      .mkString(",\n             ")
    val arms = cols.map(c =>
      s"SELECT '$c' AS column_name, n_rows, ndv_$c AS ndv, nulls_$c AS n_nulls FROM a")
      .mkString("\n    UNION ALL ")
    s"""
    WITH a AS (
      SELECT count(*) AS n_rows,
             $aggSelects
      FROM orders)
    $arms"""
  }

  /** q85 — hierarchical rollup via a RECURSIVE CTE (Spark 4.1's
    * UnionLoop): every document hangs in a category tree (parent =
    * `id div 2` — the synthetic stand-in for a real taxonomy), and the
    * query materializes the ancestor closure and rolls token counts up
    * to every subtree — the BOM/org-chart/category-rollup shape that
    * needed iterative driver code before recursive CTEs landed.
    *
    * Scale shape: the closure is |docs| × depth rows and the recursion
    * runs depth iterations — bounded by the HIERARCHY (log₂ N here,
    * ~10-20 levels for a real taxonomy), not the corpus; each
    * iteration is one map step (`ancestor div 2`) with no join, and
    * the rollup is a single grouped aggregate over the closure. The
    * same text works verbatim in DuckDB, so the oracle is the same
    * query — both engines' recursion semantics are pinned against
    * each other.
    */
  val q85HierarchyRollup: Q = (s, dir) => {
    // r14 optimization: the recursive CTE (UnionLoop) executed one
    // sequential JOB PER LEVEL — 35 driver round-trips at sf0.1, each
    // a full cluster barrier at scale — to walk a chain with a CLOSED
    // FORM: `ancestor DIV 2` from doc_id is strictly decreasing until
    // it hits 0, so the ancestor set is exactly
    // `shiftright(doc_id, k)` for k = 0..length(bin(doc_id)) (for
    // doc_id > 0; bin-length = floor(log₂)+1, and one step past it
    // lands the final 0 row the recursion also emits; doc_id <= 0 is
    // its own single anchor row — the `<=` guard matters: bin() of a
    // NEGATIVE long is 64 two's-complement chars, which would explode
    // 65 rows where the recursion's `WHERE ancestor > 0` emits one,
    // so non-positive ids are pinned to k = 0 to match the recursion
    // on the full int64 domain, not just the corpus's doc_id >= 0).
    // One explode + one grouped aggregate
    // — a single pass, no recursion limit, no per-level jobs
    // (measured: 35 jobs → 3, 1.9s → 0.6s at sf0.1). The DuckDB
    // oracle below STAYS the recursive CTE, so the closed form is
    // re-proven equivalent against real recursion semantics on every
    // correctness run.
    Tables.loadParallel(s, dir, "documents")
      .selectExpr("doc_id",
        "size(split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')) AS n_tokens")
      .selectExpr("doc_id", "n_tokens",
        "explode(sequence(0, if(doc_id <= 0, 0, length(bin(doc_id))))) AS k")
      .selectExpr("shiftright(doc_id, k) AS category", "n_tokens")
      .groupBy("category")
      .agg(count(lit(1)).as("n_desc_docs"),
        sum("n_tokens").cast("long").as("subtree_tokens"))
  }

  val q85HierarchyRollupSql: String = """
    WITH RECURSIVE d AS (
      SELECT doc_id,
             len(str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' '))
               AS n_tokens
      FROM documents),
    anc AS (
      SELECT doc_id, doc_id AS ancestor, n_tokens FROM d
      UNION ALL
      SELECT doc_id, ancestor // 2 AS ancestor, n_tokens
      FROM anc WHERE ancestor > 0)
    SELECT ancestor AS category, count(*) AS n_desc_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS subtree_tokens
    FROM anc GROUP BY ancestor"""

  /** q86 — per-segment revenue trend via exact-sum linear regression:
    * monthly revenue per market segment, then the least-squares slope/
    * intercept of revenue over the month index. The regr_slope shape —
    * but NOT regr_slope itself: Spark and DuckDB both implement it as
    * running double covariance whose value depends on merge order, so
    * it can never hash-match. Instead the five regression sufficient
    * statistics (n, Σx, Σy, Σxy, Σx²) are exact int64 sums (x = month
    * index ≤ ~84, y = exact cents), combined once:
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) — numerator and denominator
    * exact bigints, one IEEE double division at the end. Overflow
    * headroom: nΣxy ≈ n²·x̄·ȳ ≈ 84²·80·(monthly cents) stays under
    * 2^63 through ~sf100; past that the sums widen to decimal(38,0)
    * with the same one-division discipline.
    *
    * Scale shape: fact table aggregates once to the (segment, month)
    * grain — map-side partial agg shrinks the exchange to |segments|×
    * |months| rows; the customer dim is broadcast; the regression
    * itself runs over ≤ 5×84 rows. No window, no second data-sized
    * shuffle.
    */
  val q86RegrTrend: Q = (s, dir) => {
    val monthly = Tables.load(s, dir, "orders")
      .join(broadcast(Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        ((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))
    monthly.groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_months"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope_cents_per_month",
        (col("n_months") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n_months") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("intercept_cents",
        (col("sy").cast("double") -
          col("slope_cents_per_month") * col("sx").cast("double")) /
        col("n_months").cast("double"))
      .select("c_mktsegment", "n_months", "slope_cents_per_month",
        "intercept_cents")
  }

  val q86RegrTrendSql: String = """
    WITH monthly AS (
      SELECT c_mktsegment,
             CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    stats AS (
      SELECT c_mktsegment, COUNT(*) AS n_months,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
      FROM monthly GROUP BY 1)
    SELECT c_mktsegment, n_months,
           CAST(n_months*sxy - sx*sy AS DOUBLE)
             / CAST(n_months*sxx - sx*sx AS DOUBLE) AS slope_cents_per_month,
           (CAST(sy AS DOUBLE)
              - (CAST(n_months*sxy - sx*sy AS DOUBLE)
                 / CAST(n_months*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n_months AS DOUBLE) AS intercept_cents
    FROM stats"""

  /** q88 — exponential time-decay engagement score: each user's
    * Σ value·2^(−age/halflife), the recency-weighted activity feature
    * a ranking/churn model consumes (and the batch twin of the
    * streaming EWMA in [[graft.streaming.AnomalyEwma]]). Half-life
    * 7 days; age measured back from the corpus max(ts) so the query
    * is deterministic for any snapshot.
    *
    * Determinism: age quantizes to whole SECONDS with integer
    * arithmetic, the decay exponent is built from literal IEEE
    * constants with an identical op sequence in both engines, and the
    * weight rounds ONCE to integer micros (t9's rule) — after that,
    * term = cents·w_micro and the per-user sum are exact int64, so
    * reduce order cannot change the hash. One final integer division
    * scales back to cents.
    *
    * Scale shape: one events scan → map stage (weights are per-row
    * arithmetic, no lookup) → ONE map-combined groupBy(user_id)
    * exchange of |users| rows; the max(ts) anchor is a one-row
    * broadcast (q39's scalar shape). No window, no second shuffle.
    */
  val q88DecayScore: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        cents(col("value")).as("cents"))
    val anchor = ev.agg(max("us").as("max_us"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("age_s", expr("(max_us - us) div 1000000"))
      .withColumn("w_micro",
        expr("cast(round(1e6 * exp(-(cast(age_s as double) / 604800.0) " +
          "* 0.6931471805599453)) as bigint)"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(expr("cents * w_micro")).as("sum_micro"),
        max("us").as("last_us"))
      .select(col("user_id"), col("n_events"),
        expr("sum_micro div 1000000").as("decayed_cents"), col("last_us"))
  }

  val q88DecayScoreSql: String = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(round(value*100) AS BIGINT) AS cents
      FROM events),
    anchor AS (SELECT max(us) AS max_us FROM ev),
    w AS (
      SELECT user_id, us, cents,
             CAST(round(1e6 * exp(-(CAST((max_us - us) // 1000000 AS DOUBLE)
                                     / 604800.0) * 0.6931471805599453)) AS BIGINT)
               AS w_micro
      FROM ev CROSS JOIN anchor)
    SELECT user_id, count(*) AS n_events,
           CAST(SUM(cents * w_micro) AS BIGINT) // 1000000 AS decayed_cents,
           CAST(max(us) AS BIGINT) AS last_us
    FROM w GROUP BY user_id"""

  /** q89 — sequential pattern mining, depth 3: the most frequent
    * event-type trigrams across user journeys (q82's Markov bigrams
    * only see one step; three-step patterns separate "browse→buy"
    * from "browse→compare→buy" — the journey motifs a funnel designer
    * or next-action model trains on). Support is counted per user
    * occurrence; output is every trigram with RELATIVE support ≥ 0.5%
    * of all trigram occurrences (scale-invariant, unlike an absolute
    * min-support), with its share in basis points.
    *
    * Scale shape: ONE user-keyed window (two leads ride the same
    * sort) then a map-combined aggregate to the |types|³-bounded
    * pattern grain — the classic PrefixSpan exponential blow-up never
    * appears because depth is fixed at 3 and the event alphabet is a
    * data-model dimension. The relative-support filter runs on that
    * bounded grain against the one-row total broadcast (q39's scalar
    * shape).
    */
  val q89SeqPatterns: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tri = Tables.load(s, dir, "events")
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull)
      .groupBy(col("event_type").as("step1"),
        col("t1").as("step2"), col("t2").as("step3"))
      .agg(count(lit(1)).as("support"))
    val tot = tri.agg(sum("support").as("tot"))
    tri.crossJoin(broadcast(tot))
      .filter(col("support") * 200 >= col("tot"))
      .select(col("step1"), col("step2"), col("step3"), col("support"),
        expr("(10000 * support) div tot").as("share_bp"))
  }

  val q89SeqPatternsSql: String = """
    WITH t AS (
      SELECT event_type AS step1,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS step2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS step3
      FROM events),
    c AS (
      SELECT step1, step2, step3, count(*) AS support
      FROM t WHERE step3 IS NOT NULL GROUP BY 1, 2, 3),
    tot AS (SELECT CAST(SUM(support) AS BIGINT) AS tot FROM c)
    SELECT step1, step2, step3, support,
           (10000 * support) // tot AS share_bp
    FROM c CROSS JOIN tot
    WHERE support * 200 >= tot"""

  /** q91 — telemetry debounce: suppress events of the same
    * (user, event_type) that arrive within one hour of the PREVIOUS
    * event in that stream (double-clicks, retry storms, sensor
    * chatter). The lag-based contract — "gap to the immediately
    * preceding raw event" — is deliberate: it is one window function
    * over the (user_id, event_type) partition, deterministic under the
    * (ts, event_id) tie-break, and SQL-expressible, where the
    * "previous KEPT event" variant is a running fold (q17's
    * sessionize-style cumulative trick covers that family).
    *
    * Scale shape: ONE hash exchange on (user_id, event_type) + an
    * in-partition sort — the same shape as q17/q76; no driver state,
    * no self-join. Per-key partitions are user-stream sized, so skew
    * is bounded by the hottest (user, type) stream, not the table.
    */
  val q91Debounce: Q = (s, dir) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNull || col("us") - col("prev_us") > 3600000000L)
      .select("event_id", "user_id", "event_type", "us")
  }

  val q91DebounceSql: String = """
    WITH r AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events)
    SELECT event_id, user_id, event_type, us
    FROM r WHERE prev_us IS NULL OR us - prev_us > 3600000000"""

  /** q92 — rolling active users: DAU plus exact 7-day and 28-day
    * rolling distinct-user counts per observed day — the engagement
    * staple (DAU/WAU/MAU) every product dashboard tracks. Exactness
    * via CONTRIBUTION explode, not a distinct-over-range window (which
    * Spark can't express) and not a per-day self-join (which rescans
    * activity 28×): each active (user, day) pair emits the 7 / 28
    * window-END days it contributes to, and a distinct on
    * (user, end_day) + count collapses to the answer.
    *
    * Scale shape: activity first collapses to the (user, day) grain
    * (ONE user-keyed exchange — the big one, input-row sized), and the
    * window fan-out is a bounded ×7/×28 on that already-collapsed
    * grain. At 100 TB the exact distinct swaps for q22's KMV / HLL
    * sketch per day with sketch-merge across the window — the declared
    * sketch twin; this is the exact form eval needs.
    */
  val q92ActiveUsers: Q = (s, dir) => {
    val act = Tables.load(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .registerCache()
    def rolling(span: Int, name: String) = act
      .select(col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${span - 1}))")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as(name))
    val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
    dau.join(rolling(7, "wau"), "day").join(rolling(28, "mau"), "day")
      .select("day", "dau", "wau", "mau")
  }

  val q92ActiveUsersSql: String = """
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM act),
    dau AS (SELECT day, count(*) AS dau FROM act GROUP BY day),
    wau AS (SELECT d.day, count(DISTINCT a.user_id) AS wau
            FROM days d JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day),
    mau AS (SELECT d.day, count(DISTINCT a.user_id) AS mau
            FROM days d JOIN act a ON a.day BETWEEN d.day - 27 AND d.day
            GROUP BY d.day)
    SELECT day, dau, wau, mau
    FROM dau JOIN wau USING (day) JOIN mau USING (day)"""

  val queries: Map[String, Q] = Map(
    "q92_active_users" -> q92ActiveUsers,
    "q91_debounce" -> q91Debounce,
    "q89_seq_patterns" -> q89SeqPatterns,
    "q88_decay_score" -> q88DecayScore,
    "q86_regr_trend" -> q86RegrTrend,
    "q85_hierarchy_rollup" -> q85HierarchyRollup,
    "q84_table_stats" -> q84TableStats,
    "q83_sla_percentiles" -> q83SlaPercentiles,
    "q82_markov_transitions" -> q82MarkovTransitions,
    "q81_multi_touch"      -> q81MultiTouch,
    "q79_session_funnel"   -> q79SessionFunnel,
    "q80_decile_lift"      -> q80DecileLift,
    "q76_gap_percentiles"  -> q76GapPercentiles,
    "q74_yoy_growth"       -> q74YoyGrowth,
    "q72_rfm"              -> q72Rfm,
    "q71_mad_outliers"     -> q71MadOutliers,
    "q65_anomaly_zscore"   -> q65AnomalyZscore,
    "q66_winsorized_mean"  -> q66WinsorizedMean,
    "q56_time_weighted"    -> q56TimeWeighted,
    "q49_share_of_total"   -> q49ShareOfTotal,
    "q47_sliding_range"    -> q47SlidingRange,
    "q44_grouping_sets"    -> q44GroupingSets,
    "q45_latest_per_key"   -> q45LatestPerKey,
    "q46_filtered_agg"     -> q46FilteredAgg,
    "q42_cohort_retention" -> q42CohortRetention,
    "q34_cube"         -> q34Cube,
    "q35_unpivot"      -> q35Unpivot,
    "q36_fuzzy_pairs"  -> q36FuzzyPairs,
    "q37_gap_fill"     -> q37GapFill,
    "q38_dist_windows" -> q38DistWindows,
    "q41_funnel"       -> q41Funnel,
  )

  val oracleSql: Map[String, String] = Map(
    "q92_active_users" -> q92ActiveUsersSql,
    "q91_debounce" -> q91DebounceSql,
    "q89_seq_patterns" -> q89SeqPatternsSql,
    "q88_decay_score" -> q88DecayScoreSql,
    "q86_regr_trend" -> q86RegrTrendSql,
    "q85_hierarchy_rollup" -> q85HierarchyRollupSql,
    "q84_table_stats" -> q84TableStatsSql,
    "q83_sla_percentiles" -> q83SlaPercentilesSql,
    "q82_markov_transitions" -> q82MarkovTransitionsSql,
    "q81_multi_touch"      -> q81MultiTouchSql,
    "q79_session_funnel"   -> q79SessionFunnelSql,
    "q80_decile_lift"      -> q80DecileLiftSql,
    "q76_gap_percentiles"  -> q76GapPercentilesSql,
    "q74_yoy_growth"       -> q74YoyGrowthSql,
    "q72_rfm"              -> q72RfmSql,
    "q71_mad_outliers"     -> q71MadOutliersSql,
    "q65_anomaly_zscore"   -> q65AnomalyZscoreSql,
    "q66_winsorized_mean"  -> q66WinsorizedMeanSql,
    "q56_time_weighted"    -> q56TimeWeightedSql,
    "q49_share_of_total"   -> q49ShareOfTotalSql,
    "q47_sliding_range"    -> q47SlidingRangeSql,
    "q44_grouping_sets"    -> q44GroupingSetsSql,
    "q45_latest_per_key"   -> q45LatestPerKeySql,
    "q46_filtered_agg"     -> q46FilteredAggSql,
    "q42_cohort_retention" -> q42CohortRetentionSql,
    "q34_cube"         -> q34CubeSql,
    "q35_unpivot"      -> q35UnpivotSql,
    "q36_fuzzy_pairs"  -> q36FuzzyPairsSql,
    "q37_gap_fill"     -> q37GapFillSql,
    "q38_dist_windows" -> q38DistWindowsSql,
    "q41_funnel"       -> q41FunnelSql,
  )
}

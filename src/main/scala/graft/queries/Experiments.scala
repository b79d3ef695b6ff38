package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Product-analytics / experimentation / audit queries beyond the
  * reference surface (the reference's `index_counts.ipynb` stops at
  * per-table daily counts — these are the measurement queries a
  * product team runs over the same event stream): cohort retention,
  * deterministic-bucket A/B significance testing, and a Benford
  * first-digit audit. All oracle-checked vs DuckDB at sf0.01, all
  * integer-exact (retention/conversion in basis points, test
  * statistics in micros) so the cross-engine hash gate is bit-exact.
  */
object Experiments {

  type Q = (SparkSession, String) => DataFrame

  // =========================================================================
  // q93 — cohort retention matrix
  // =========================================================================

  /** Daily signup-cohort retention: users are grouped by the day of
    * their first `signup` event; for each cohort × day-offset cell,
    * how many of them were active (ANY event) that day, in basis
    * points of the cohort size. The offset-0 cell is 100% by
    * construction (signup itself is activity) — a built-in sanity
    * anchor for the whole matrix. Day grain rather than the textbook
    * month because it's the same query at any grain and the grain
    * should match the data's span (production runs pass month here).
    *
    * Days are compared as the integer epoch-day index, so the offset
    * arithmetic is exact and engine-neutral (no interval or
    * months_between semantics involved).
    *
    * Scale shape: two user-keyed aggregates (first-signup day,
    * distinct active days — both map-side combined on user_id) and
    * one equi-join on user_id sharing that partitioning; the final
    * aggregate lands on the (|cohorts| × |offsets|)-bounded matrix
    * grain. Nothing is event²; the only distinct runs inside the
    * (cohort, offset, user) shuffle that the matrix aggregate needs
    * anyway.
    */
  val q93CohortRetention: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val dayIdx = expr("datediff(cast(ts as date), date '1970-01-01')").cast("long")
    val cohorts = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(dayIdx).as("cd"))
    val sizes = cohorts.groupBy("cd").agg(count(lit(1)).as("cohort_size"))
    val active = e.select(col("user_id"), dayIdx.as("ad")).distinct()
    cohorts.join(active, "user_id")
      .filter(col("ad") >= col("cd"))
      .groupBy(col("cd"), (col("ad") - col("cd")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cd")
      .select(
        expr("date_add(date '1970-01-01', cast(cd as int))").as("cohort_day"),
        col("day_offset"), col("cohort_size"), col("n_active"),
        expr("n_active * 10000 div cohort_size").as("retention_bp"))
  }

  val q93CohortRetentionSql: String = """
    WITH cohorts AS (
      SELECT user_id, min(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)) AS cd
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    sizes AS (SELECT cd, count(*) AS cohort_size FROM cohorts GROUP BY cd),
    active AS (SELECT DISTINCT user_id,
                      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ad
               FROM events),
    ret AS (
      SELECT cd, ad - cd AS day_offset, count(DISTINCT user_id) AS n_active
      FROM cohorts JOIN active USING (user_id) WHERE ad >= cd
      GROUP BY cd, ad - cd)
    SELECT DATE '1970-01-01' + CAST(cd AS INT) AS cohort_day,
           day_offset, cohort_size, n_active,
           n_active * 10000 // cohort_size AS retention_bp
    FROM ret JOIN sizes USING (cd)"""

  // =========================================================================
  // q94 — A/B conversion with a two-proportion significance test
  // =========================================================================

  /** Deterministic-bucket A/B readout: users hash into variants A/B
    * by c1's md5 bucket (how production assignment actually works —
    * no RNG, stable under re-runs and corpus growth), exposure = has
    * a `view` event, conversion = a `purchase` within ONE HOUR after
    * the first view (the attribution window that makes conversion a
    * real signal rather than "ever purchased"). Emits per-variant
    * counts + conversion in bp and the pooled two-proportion z²
    * statistic — z² rather than z because
    * z² = (c_a·n_b − c_b·n_a)²·(n_a+n_b) / (n_a·n_b·c·(n−c)) is a
    * RATIONAL function of the four counts: it evaluates in exact
    * int64 with one division sequence spelled identically in both
    * engines, where z itself would need a sqrt whose rounding the
    * hash gate couldn't tolerate. `significant` = z² > 3.841459
    * (χ²₁ at 95%), compared in micros; the degenerate boards
    * (zero or all conversions) emit NULL via a nullif'd denominator
    * rather than erroring under ANSI division.
    *
    * Scale shape: one user-grain first-view aggregate, one user-keyed
    * equi-join of the purchase stream against it (both sides hash on
    * user_id; the window predicate filters in-join), one user-grain
    * conversion aggregate riding the SAME partitioning, then a
    * one-row conditional aggregate. Numeric bound (r7 advice): the
    * statistic is ONE division — 10⁶·diff²·n over n_a·n_b·c·(n−c) —
    * evaluated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); the
    * numerator ≈ 10⁶·U⁵/16 under the worst split, so values are
    * EXACT (no staged-truncation bias) to U ≈ 4×10⁶ exposed users.
    * Past that Spark's non-ANSI decimal overflow yields NULL while
    * DuckDB raises — at that scale the readout moves to float z
    * (the threshold compare is monotone; the hash gate is a small-SF
    * instrument anyway).
    */
  val q94AbConversion: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val firstView = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("first_view"))
    val perUser = firstView
      .join(e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts")), Seq("user_id"), "left")
      .groupBy("user_id")
      .agg(max(when(col("pts") > col("first_view") &&
        col("pts") <= col("first_view") + expr("INTERVAL 1 HOUR"), 1L)
        .otherwise(0L)).as("converted"))
      .select(
        expr("cast(conv(substr(md5(cast(user_id as string)), 1, 4), 16, 10) as bigint) % 2")
          .as("variant"),
        col("converted"))
    perUser.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("conv_b"))
      // ONE final division with the 10^6 scale already in the
      // numerator: no intermediate truncation (the staged form biased
      // z2 low by up to 10^6·n/(c·(n−c)) micro), and the numerator
      // runs in DECIMAL(38,0) — diff² alone wraps int64 at ~10^5-10^6
      // exposed users, silently under non-ANSI. The denominator also
      // goes decimal (n_a·n_b·c·(n−c) ≈ U⁴/16 wraps int64 at ~3×10⁴).
      .withColumn("z2_micro", expr(
        """(cast(conv_a * n_b - conv_b * n_a as decimal(38,0))
             * (conv_a * n_b - conv_b * n_a) * 1000000 * (n_a + n_b))
           div (cast(n_a as decimal(38,0)) * n_b
                * nullif((conv_a + conv_b) * (n_a + n_b - conv_a - conv_b), 0))"""))
      .select(col("n_a"), col("conv_a"),
        expr("conv_a * 10000 div n_a").as("cvr_a_bp"),
        col("n_b"), col("conv_b"),
        expr("conv_b * 10000 div n_b").as("cvr_b_bp"),
        col("z2_micro"),
        (col("z2_micro") > 3841459L).as("significant"))
  }

  val q94AbConversionSql: String = """
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    pu AS (
      SELECT fv.user_id,
             max(CASE WHEN e.ts > fv.first_view
                       AND e.ts <= fv.first_view + INTERVAL 1 HOUR
                      THEN 1 ELSE 0 END) AS converted
      FROM fv LEFT JOIN (SELECT user_id, ts FROM events
                         WHERE event_type = 'purchase') e USING (user_id)
      GROUP BY fv.user_id),
    v AS (
      SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS variant,
             converted
      FROM pu),
    agg AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      FROM v),
    z AS (
      SELECT *,
             CAST((CAST(conv_a * n_b - conv_b * n_a AS HUGEINT)
                     * (conv_a * n_b - conv_b * n_a) * 1000000 * (n_a + n_b))
                  // (CAST(n_a AS HUGEINT) * n_b
                      * nullif((conv_a + conv_b) * (n_a + n_b - conv_a - conv_b), 0))
                  AS BIGINT) AS z2_micro
      FROM agg)
    SELECT n_a, conv_a, conv_a * 10000 // n_a AS cvr_a_bp,
           n_b, conv_b, conv_b * 10000 // n_b AS cvr_b_bp,
           z2_micro, z2_micro > 3841459 AS significant
    FROM z"""

  // =========================================================================
  // q95 — Benford first-digit audit
  // =========================================================================

  /** Benford's-law first-digit audit over order totals — the
    * fraud/synthetic-data screen an audit pipeline runs over any
    * money column: observed first-significant-digit counts vs the
    * Benford expectation p(d) = log10(1+1/d), with the per-digit χ²
    * contribution in MILLI-counts. The log10 table is nine hard-coded
    * integer micro-probabilities summing to exactly 10⁶ (no runtime
    * log), and the first digit is extracted from the cents-integer's
    * decimal string — `substr(cast(round(x*100) as bigint), 1, 1)` —
    * because the leading digit of round(100·x) IS the leading
    * significant digit of x for any x ≥ 0.01, with zero float-log
    * boundary risk. (The synthetic uniform prices will FAIL Benford —
    * large contrib values are the audit working, not noise.)
    *
    * Scale shape: one map-side-combined 9-group aggregate over the
    * scan (only o_totalprice read), one one-row total broadcast-
    * crossed back (q39's scalar shape), and a 9-element literal
    * array lookup for the expectation. χ² arithmetic bound:
    * diff_milli² ≤ (10³·N)² — int64-safe to N ≈ 3·10⁶ per digit cell
    * at milli precision; beyond that the same query runs at centi.
    */
  val q95Benford: Q = (s, dir) => {
    val pMicro = "array(301030L, 176091L, 124939L, 96910L, 79181L, " +
      "66947L, 57992L, 51153L, 45757L)"
    val obs = Tables.load(s, dir, "orders")
      .select(expr(
        "cast(substr(cast(cast(round(o_totalprice * 100) as bigint) as string), 1, 1) as bigint)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = obs.agg(sum("n_obs").as("n_total"))
    obs.crossJoin(broadcast(total))
      .withColumn("exp_milli",
        expr(s"n_total * element_at($pMicro, cast(digit as int)) div 1000"))
      .select(col("digit"), col("n_obs"), col("exp_milli"),
        expr("""(n_obs * 1000 - exp_milli) * (n_obs * 1000 - exp_milli)
                div exp_milli""").as("chi2_contrib_milli"))
  }

  val q95BenfordSql: String = """
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n_obs
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM obs),
    e AS (
      SELECT digit, n_obs,
             n_total * list_extract([301030, 176091, 124939, 96910, 79181,
                                     66947, 57992, 51153, 45757], CAST(digit AS INT)) // 1000 AS exp_milli
      FROM obs CROSS JOIN tot)
    SELECT digit, n_obs, exp_milli,
           (n_obs * 1000 - exp_milli) * (n_obs * 1000 - exp_milli) // exp_milli AS chi2_contrib_milli
    FROM e"""

  // =========================================================================
  // q99 — seasonal anomaly cells (hour-of-day profile residuals)
  // =========================================================================

  /** Batch-side telemetry anomaly detection, the companion to the
    * streaming EWMA detector: event volume per (event_type, day, hour)
    * cell scored against that type's HOUR-OF-DAY profile (same-hour
    * cells across all days), flagging cells more than two standard
    * deviations off their seasonal mean. This is the seasonal-naive
    * baseline every monitoring system starts with — a weekday-shaped
    * metric compared to "this hour, usually", not to the global mean
    * that hides the diurnal cycle.
    *
    * Exactness: the z-test runs entirely on integer sufficient
    * statistics — n, Σc, Σc² per (type, hour) — and the |z| > 2 flag
    * is the cross-multiplied inequality (n·c − Σc)² > 4·(n·Σc² −
    * (Σc)²), so no mean, variance, or sqrt is ever materialized in
    * floats. Bound: |n·c − Σc| must stay under ~3·10⁹ for the square
    * to fit int64 — comfortable for day-grain profiles (n = days
    * observed, c = hourly counts); a 100 TB deployment normalizes c
    * to per-million-events first or lifts the square into decimal.
    * Cells with fewer than 7 observed days never flag (profile too
    * thin). Zero-count cells are absent rows, not zeros — the
    * missing-data anomaly is q37's gap-fill family; this query scores
    * volume anomalies among observed cells and says so.
    *
    * Scale shape: one map-combined count to the cell grain, one
    * map-combined profile aggregate to the (|types|·24)-row grain
    * broadcast back onto cells — no data-sized join side, no window.
    */
  val q99SeasonalOutliers: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val cells = e.select(col("event_type"),
        expr("datediff(cast(ts as date), date '1970-01-01')").cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"))
      .groupBy("event_type", "d", "h").agg(count(lit(1)).as("cnt"))
    val profile = cells.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n"), sum("cnt").as("s1"),
        sum(expr("cnt * cnt")).as("s2"))
    cells.join(broadcast(profile), Seq("event_type", "h"))
      .select(col("event_type"), col("d"), col("h"), col("cnt"), col("n"),
        expr("s1 * 1000000 div n").as("mean_micro"),
        (col("n") >= 7 &&
          expr("(n*cnt - s1) * (n*cnt - s1) > 4 * (n*s2 - s1*s1)"))
          .as("is_outlier"))
  }

  val q99SeasonalOutliersSql: String = """
    WITH cells AS (
      SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
             CAST(hour(ts) AS BIGINT) AS h,
             count(*) AS cnt
      FROM events GROUP BY 1, 2, 3),
    profile AS (
      SELECT event_type, h, count(*) AS n,
             CAST(SUM(cnt) AS BIGINT) AS s1,
             CAST(SUM(cnt * cnt) AS BIGINT) AS s2
      FROM cells GROUP BY 1, 2)
    SELECT c.event_type, c.d, c.h, c.cnt, p.n,
           s1 * 1000000 // n AS mean_micro,
           (n >= 7 AND (n*cnt - s1) * (n*cnt - s1) > 4 * (n*s2 - s1*s1)) AS is_outlier
    FROM cells c JOIN profile p ON c.event_type = p.event_type AND c.h = p.h"""

  val queries: Map[String, Q] = Map(
    "q93_cohort_retention" -> q93CohortRetention,
    "q94_ab_conversion"    -> q94AbConversion,
    "q95_benford"          -> q95Benford,
    "q99_seasonal_outliers" -> q99SeasonalOutliers,
  )

  val oracleSql: Map[String, String] = Map(
    "q93_cohort_retention" -> q93CohortRetentionSql,
    "q94_ab_conversion"    -> q94AbConversionSql,
    "q95_benford"          -> q95BenfordSql,
    "q99_seasonal_outliers" -> q99SeasonalOutliersSql,
  )
}

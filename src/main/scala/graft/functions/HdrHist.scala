package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** HDR-style decimal histogram quantiles — the mergeable percentile
  * sketch next to KMV (distinct) and count-min (frequency).
  *
  * q83 computes exact percentiles by sorting each group; at 100 TB a
  * GLOBAL percentile that way is a full-corpus sort. The scalable
  * answer every metrics system ships (HdrHistogram, DDSketch, Prom
  * buckets) is a bounded histogram with relative-error buckets: bucket
  * a value by its TWO leading decimal digits (lb = first two digits ·
  * 10^(d−2)), estimate a quantile as the lower bound of the bucket
  * the target rank falls in. Error < one part in ten of the value by
  * construction (bucket width / lb ≤ 10/10 = 1/10th), buckets are
  * 90/decade so the whole histogram is ≤ 90·19 rows for ANY int64
  * domain — a map-side-combinable groupBy onto a constant-size key
  * set: ONE tiny shuffle, mergeable across partitions, days, and
  * clusters (histograms add), where the exact path is a global sort.
  *
  * Everything stays engine-neutral: the bucket is built from the
  * cents-integer's decimal STRING (substr + repeat('0')), never a
  * float log10, so no power-of-ten boundary can round differently
  * across engines (q95's digit discipline); the quantile definition is
  * "smallest bucket whose cumulative count reaches ceil(p·n/100)" —
  * rank arithmetic in exact int64. The audit columns carry the exact
  * discrete quantile (smallest VALUE with rank ≥ the same target,
  * q83's sort path run once as ground truth — s8/d18's sketch-vs-
  * exact honesty) and the (non-negative) underestimate in basis points, pinned < 1000 by
  * the spec because the bound is structural (lb ≤ value < lb·10/9-ish
  * within a two-digit bucket). Divisions stay on non-negative int64 so
  * Spark `div` (truncate) and DuckDB `//` (floor) agree.
  */
object HdrHist {

  type Q = (SparkSession, String) => DataFrame

  /** q97 — p50/p90/p99 of the order-value distribution (o_totalprice
    * cents) from the two-digit histogram, with exact ground truth and
    * error in bp. */
  val q97HdrQuantiles: Q = (s, dir) => {
    val cents = Tables.load(s, dir, "orders")
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v"),
        col("o_orderkey").as("ok"))
    // two-significant-digit lower bound via the decimal string
    val withLb = cents.withColumn("lb", expr(
      """cast(case when length(cast(v as string)) <= 2 then cast(v as string)
               else concat(substr(cast(v as string), 1, 2),
                           repeat('0', length(cast(v as string)) - 2)) end
          as bigint)"""))
    val hist = withLb.groupBy("lb").agg(count(lit(1)).as("cnt"))
    // cumulative over the ≤90·19-row histogram frame (bounded by the
    // bucket scheme, never the data)
    val cum = hist.withColumn("cum",
      sum("cnt").over(Window.orderBy("lb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = cents.agg(count(lit(1)).as("n"))
    val targets = Seq(50, 90, 99)
    val est = cum.crossJoin(broadcast(n))
      .select(col("lb"), col("cum"), col("n"))
      .agg(min(when(col("cum") * 100 >= col("n") * 50, col("lb"))).as("est_p50"),
        targets.tail.map { p =>
          min(when(col("cum") * 100 >= col("n") * p, col("lb"))).as(s"est_p$p")
        }: _*)
    // exact discrete quantiles: smallest value with rank ≥ ceil(p·n/100).
    // The rank comes from DistributedRank (range exchange + local
    // sort), NEVER a partition-less row_number over the data — the
    // ground-truth side stays scale-safe too. The selected value is
    // tie-invariant (the value at sorted position t is well-defined
    // under duplicates), but DistributedRank's contract wants a total
    // order, so o_orderkey tie-breaks.
    val ranked = graft.ops.DistributedRank.withGlobalRank(
      cents, Seq(col("v"), col("ok")), "rk", "ntot")
    val exact = ranked
      .agg(min(when(col("rk") * 100 >= col("ntot") * 50, col("v"))).as("exact_p50"),
        targets.tail.map { p =>
          min(when(col("rk") * 100 >= col("ntot") * p, col("v"))).as(s"exact_p$p")
        }: _*)
    est.crossJoin(broadcast(exact))
      .select(targets.flatMap { p =>
        Seq(col(s"est_p$p"), col(s"exact_p$p"),
          expr(s"(exact_p$p - est_p$p) * 10000 div exact_p$p").as(s"err_bp_p$p"))
      }: _*)
  }

  val q97HdrQuantilesSql: String = """
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
    lbs AS (
      SELECT v, CAST(CASE WHEN length(CAST(v AS VARCHAR)) <= 2 THEN CAST(v AS VARCHAR)
                     ELSE substr(CAST(v AS VARCHAR), 1, 2) ||
                          repeat('0', length(CAST(v AS VARCHAR)) - 2) END
                AS BIGINT) AS lb
      FROM cents),
    hist AS (SELECT lb, count(*) AS cnt FROM lbs GROUP BY lb),
    cum AS (SELECT lb, SUM(cnt) OVER (ORDER BY lb
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM hist),
    n AS (SELECT count(*) AS n FROM cents),
    est AS (SELECT
        MIN(CASE WHEN cum * 100 >= n * 50 THEN lb END) AS est_p50,
        MIN(CASE WHEN cum * 100 >= n * 90 THEN lb END) AS est_p90,
        MIN(CASE WHEN cum * 100 >= n * 99 THEN lb END) AS est_p99
      FROM cum CROSS JOIN n),
    ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM cents),
    exact AS (SELECT
        MIN(CASE WHEN rk * 100 >= n * 50 THEN v END) AS exact_p50,
        MIN(CASE WHEN rk * 100 >= n * 90 THEN v END) AS exact_p90,
        MIN(CASE WHEN rk * 100 >= n * 99 THEN v END) AS exact_p99
      FROM ranked CROSS JOIN n)
    SELECT est_p50, exact_p50, (exact_p50 - est_p50) * 10000 // exact_p50 AS err_bp_p50,
           est_p90, exact_p90, (exact_p90 - est_p90) * 10000 // exact_p90 AS err_bp_p90,
           est_p99, exact_p99, (exact_p99 - est_p99) * 10000 // exact_p99 AS err_bp_p99
    FROM est CROSS JOIN exact"""

  val queries: Map[String, Q] = Map("q97_hdr_quantiles" -> q97HdrQuantiles)
  val oracleSql: Map[String, String] = Map("q97_hdr_quantiles" -> q97HdrQuantilesSql)
}

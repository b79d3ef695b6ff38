package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Approximate aggregates — HLL++ count-distinct and the quantile
  * sketch. These are engine-nondeterministic across implementations,
  * so they're validated against exact answers within their error
  * bounds instead of the DuckDB oracle (the oracle-checkable sketch is
  * the KMV query, q22).
  */
class ApproxAggSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact on order keys") {
    val o = graft.core.Tables.load(spark, sfDir, "orders")
    val row = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("approx_percentile brackets the exact median") {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .withColumn("cents", expr("cast(round(l_extendedprice*100) as bigint)"))
    val exact = li.stat.approxQuantile("cents", Array(0.5), 0.0)(0)
    val approx = li.agg(
      expr("approx_percentile(cents, 0.5, 1000)")).collect()(0).getLong(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"$approx vs $exact")
  }
}

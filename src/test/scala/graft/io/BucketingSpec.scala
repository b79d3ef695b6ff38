package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing — the co-located-join layout for repeated large joins
  * (builder contract: "co-locate joins via bucketing or
  * pre-partitioning"). Both sides bucketed on the join key into the
  * same bucket count ⇒ the join plan has NO shuffle exchange: at
  * 100 TB that's the difference between re-shuffling the fact table
  * on every join and reading it pre-placed.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.core.Tables.load(s, sfDir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      graft.core.Tables.load(s, sfDir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("customer_bkt")

      val joined = s.table("orders_bkt")
        .join(s.table("customer_bkt"), "o_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle; the only exchange allowed is
      // the one feeding the final aggregation
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

      // sanity: same result as the unbucketed join
      val plainCount = graft.core.Tables.load(s, sfDir, "orders")
        .join(graft.core.Tables.load(s, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .count()
      assert(s.table("orders_bkt").join(s.table("customer_bkt"), "o_custkey").count()
        == plainCount)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS orders_bkt")
      s.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}

package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dynamic partition pruning — the star-schema scan optimization that
  * matters most at 100 TB: a selective dim filter prunes FACT
  * partitions at runtime, so the fact scan reads only the partitions
  * the joined dim keys can reach, without the query spelling any fact
  * predicate. This spec pins that the engine's layout (partitioned
  * fact parquet + broadcast-able dim) actually triggers Spark's DPP,
  * not just static pruning.
  */
class DynamicPruningSpec extends SparkSpec {

  test("selective dim filter prunes fact partitions at runtime (DPP)") {
    val s = spark
    val dir = tmpDir("dpp")
    // fact: orders partitioned by priority (stand-in for a date
    // partition); dim: the priority dimension with attributes
    graft.core.Tables.load(s, sfDir, "orders")
      .write.partitionBy("o_orderpriority").parquet(s"$dir/fact")
    val dim = s.createDataFrame(Seq(
      ("1-URGENT", "hot"), ("2-HIGH", "hot"),
      ("3-MEDIUM", "warm"), ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold")
    )).toDF("prio", "tier")
    dim.write.parquet(s"$dir/dim")

    val fact = s.read.parquet(s"$dir/fact")
    val d = s.read.parquet(s"$dir/dim").filter(col("tier") === "hot")
    val joined = fact.join(d, fact("o_orderpriority") === d("prio"))

    val planText = joined.queryExecution.executedPlan.toString
    assert(planText.contains("dynamicpruning"),
      s"fact scan's PartitionFilters carry no DPP subquery:\n$planText")

    // and the pruned result is the same as the unpruned predicate form
    val expected = fact
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(joined.count() == expected)
  }
}

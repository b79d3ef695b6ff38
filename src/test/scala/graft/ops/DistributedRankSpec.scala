package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DistributedRank must be bit-identical to the partition-less
  * `ntile`/`rank` windows it replaces — the oracle-facing contract of
  * q72/q80 — while never moving the data grain through a
  * SinglePartition exchange. Parity is checked on a skewed,
  * duplicate-heavy distribution at several bucket counts (including
  * n > rows, the remainder edge and n = 1), because ntile's
  * floor-based bucket sizing is exactly where an off-by-one in the
  * offset join would show.
  */
class DistributedRankSpec extends SparkSpec {

  // 10_007 rows, heavily skewed values (many collisions) + unique id
  // tie-break; DistributedRank's contract requires the total order.
  private lazy val df =
    spark.range(10007)
      .select(col("id"),
        (pmod(hash(col("id")), lit(97)) * pmod(hash(col("id") + 1), lit(13)))
          .cast("long").as("v"))

  private def sortCols = Seq(col("v").desc, col("id"))

  test("withGlobalRank matches rank() over the global window") {
    val expected = df.withColumn("r",
      row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
    val got = DistributedRank.withGlobalRank(df, sortCols, "r", "tot")
    assert(got.select(max("tot")).head.getLong(0) === 10007L)
    assert(expected.select("id", "r").exceptAll(got.select("id", "r")).isEmpty)
    assert(got.select("id", "r").exceptAll(expected.select("id", "r")).isEmpty)
  }

  test("withNtile matches ntile() exactly, incl. remainder and n>rows edges") {
    for (n <- Seq(1, 7, 10, 100, 20000)) {
      val expected = df.withColumn("b",
        ntile(n).over(Window.orderBy(sortCols: _*)))
      val got = DistributedRank.withNtile(df, n, sortCols, "b")
      val diff = expected.select("id", "b").exceptAll(got.select("id", "b"))
      assert(diff.isEmpty, s"ntile($n) mismatch: ${diff.take(5).mkString(",")}")
      assert(got.count() === 10007L)
    }
  }

  test("the data grain never crosses a SinglePartition exchange") {
    val got = DistributedRank.withNtile(df, 10, sortCols, "b")
    got.collect()
    assert(graft.tools.PlanCheck.partitionlessWindows(got).isEmpty,
      got.queryExecution.executedPlan.toString)
  }

  test("the range exchange is planned once and reused by the counts branch") {
    // Offsets are only correct if both branches observe the SAME
    // range partition boundaries; Catalyst guarantees that via
    // ReuseExchange on the canonicalized subtree. Pin it: exactly one
    // materialized range exchange, one reuse.
    val got = DistributedRank.withGlobalRank(df, sortCols, "r", "tot")
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    val ranges = "rangepartitioning".r.findAllIn(plan).size
    assert(plan.contains("ReusedExchange") || ranges <= 1, plan)
  }
}

package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The native merge as-of operator vs the composed baseline: identical
  * rows, and the physical plan is the declared shape — AsOfJoinExec
  * over key-clustered, (key, time)-sorted children with NO window and
  * NO range-join candidate fan-out.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  private def nativeQ21 = graft.ops.AsOfJoin.q90AsofNative(spark, sfDir)
  private def composedQ21 = graft.ops.AsOfJoin.q21AsofJoin(spark, sfDir)

  test("native as-of equals the composed range-join+window form") {
    val n = nativeQ21
    val c = composedQ21
    assert(n.exceptAll(c).isEmpty && c.exceptAll(n).isEmpty)
  }

  test("plans as AsOfJoinExec with sorted, clustered children and no window") {
    val qe = nativeQ21.queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(plan.collect { case e: AsOfJoinExec => e }.size == 1, s)
    assert(!s.contains("Window"), s"window in native as-of plan:\n$s")
    // EnsureRequirements inserted the operator's declared exchanges +
    // the two (key, time) sorts feeding the merge (a third exchange
    // belongs to the right side's dedupe aggregate)
    assert(plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }.size >= 2, s)
    assert(plan.collect { case e: org.apache.spark.sql.execution.SortExec => e }.size == 2, s)
  }

  test("left rows with null key or time survive with null right side") {
    val sp = spark
    import sp.implicits._
    val left = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
        (Some(1L), None, "c"), (Some(2L), Some(5L), "d"))
      .toDF("k", "t", "tag")
      .select(col("k").cast("long").as("k"), col("t").cast("long").as("t"), col("tag"))
    val right = Seq((1L, 5L, "r1"), (1L, 9L, "r2"), (3L, 1L, "r3"))
      .toDF("rk", "rt", "rv")
    val out = AsOfJoinNative.asOf(left, right,
        left("k"), right("rk"), left("t"), right("rt"))
      .select("tag", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "r2", "b" -> null, "c" -> null, "d" -> null))
  }

  test("ties and history depth: greatest time at-or-before wins per left row") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 1L), (1L, 5L), (1L, 9L), (1L, 100L))
      .toDF("k", "t").withColumn("id", col("t"))
    val right = Seq((1L, 1L, "t1"), (1L, 5L, "t5"), (1L, 9L, "t9"))
      .toDF("rk", "rt", "rv")
    val out = AsOfJoinNative.asOf(left, right,
        left("k"), right("rk"), left("t"), right("rt"))
      .select("id", "rv").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "t1", 5L -> "t5", 9L -> "t9", 100L -> "t9"))
  }
}

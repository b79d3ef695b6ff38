package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  test("count-min never underestimates and catches every true heavy key") {
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .select(expr("cast(user_id as string)").as("k"))
    val exact = ev.groupBy("k").agg(count(lit(1)).as("true_cnt"))

    val est = CountMin.q29CountminHeavy(spark, sfDir)
      .select(expr("cast(user_id as string)").as("k"), col("est"))

    // over-estimate only: est >= true count for every reported key
    val under = est.join(exact, "k").filter(col("est") < col("true_cnt"))
    assert(under.isEmpty)

    // completeness: every key whose TRUE count clears the threshold is
    // reported (guaranteed, since estimates only go up)
    val missed = exact.filter(col("true_cnt") >= 40)
      .join(est, Seq("k"), "left_anti")
    assert(missed.isEmpty)
  }

  test("sketch grid size is bounded by depth*width regardless of input") {
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .select(expr("cast(user_id as string)").as("k"))
    val n = CountMin.sketch(ev, "k").count()
    assert(n <= 3L * 64L)
  }
}

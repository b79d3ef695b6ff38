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

  test("q100: inner-product join-size estimate overestimates only, within the width bound") {
    val r = CountMin.q100JoinSizeSketch(spark, sfDir).head()
    val actual = r.getAs[Long]("actual_rows")
    val est = r.getAs[Long]("est_rows")
    assert(actual > 0)
    // AMS/CM inner product: colliding keys only ADD — never under
    assert(est >= actual, s"est=$est < actual=$actual")
    // the 5x16384 grid's collision noise stays well inside 20%
    assert(r.getAs[Long]("over_bp") < 2000L,
      s"over_bp=${r.getAs[Long]("over_bp")}")
  }
}

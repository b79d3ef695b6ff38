package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Dev scratch main for plan/sink debugging. */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 32, appName = "graft-debug")
    val sfDir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val ev = Tables.load(spark, sfDir, "events")
    time("events noop")(ev.write.format("noop").mode("overwrite").save())

    val q7 = graft.ops.EventNormalize.normalize(spark, sfDir)
    time("q7 select 3 cols noop")(
      q7.select("event_id", "event_label", "value_bucket")
        .write.format("noop").mode("overwrite").save())
    time("q7 no-json noop")(
      q7.drop("prop_k").write.format("noop").mode("overwrite").save())
    time("q7 full noop")(q7.write.format("noop").mode("overwrite").save())
    println(q7.queryExecution.executedPlan.toString.take(600))
    spark.stop()
  }
}

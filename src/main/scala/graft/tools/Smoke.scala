package graft.tools

import graft.core.Sessions

/** Dev smoke runner mirroring the driver's t1 check: SparkEntry.entry
  * must return >0 rows on sf0.001. Prints schema + a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8, appName = "graft-smoke")
    val df = graft.SparkEntry.entry(spark)
    df.printSchema()
    df.show(5, truncate = false)
    println(s"entry rows = ${df.count()}")
    spark.stop()
  }
}

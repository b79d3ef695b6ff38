package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.io.IdempotentWriter

/** Dev scratch main for plan/sink debugging. */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8, appName = "graft-debug")
    val sfDir = "/root/testdata/sf0.001"

    println("=== q1 executedPlan (post-count) ===")
    val q1 = graft.queries.Registry.queries("q1_pricing_summary")(spark, sfDir)
    q1.count()
    println(q1.queryExecution.executedPlan.toString.take(1500))

    println("=== partitionRefresh debug ===")
    val out = java.nio.file.Files.createTempDirectory("dbg").toString
    val nation = Tables.load(spark, sfDir, "nation")
    val d1 = nation.withColumn("dt", lit("20240101"))
    val d2 = nation.limit(5).withColumn("dt", lit("20240102"))
    IdempotentWriter.partitionRefresh(d1, s"$out/t", "dt")
    IdempotentWriter.partitionRefresh(d2, s"$out/t", "dt")
    val d2b = nation.limit(3).withColumn("dt", lit("20240102"))
    val written = IdempotentWriter.partitionRefresh(d2b, s"$out/t", "dt")
    println(s"written=$written")
    spark.read.parquet(s"$out/t").groupBy("dt").count().show()
    spark.stop()
  }
}

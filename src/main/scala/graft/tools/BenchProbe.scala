package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run the bench query set repeatedly in one JVM to separate
  * steady-state cost from JVM/codegen warmup and GC drift.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (iter <- 1 to iters) {
      val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
      println(s"iter $iter: " + results.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}

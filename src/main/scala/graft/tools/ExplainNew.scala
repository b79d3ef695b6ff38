package graft.tools

/** Scratch: print physical plans for newly added queries. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q")
      println(graft.queries.Registry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.linesIterator.take(28).mkString("\n"))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for slow-query investigation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Tables

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    t("warm") { sink(Tables.load(spark, dir, "lineitem")) }

    val SuppOffset = 1000000000L
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val edgesPlain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + SuppOffset).as("dst"))
      .distinct()
    t("edges build") { sink(edgesPlain) }
    t("edges count") { println(edgesPlain.count()) }

    val edges = edgesPlain.persist()
    t("edges cache materialize") { sink(edges) }

    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    t("outdeg") { sink(outdeg) }
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().persist()
    t("nodes") { sink(nodes) }

    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (r <- 1 to 3) {
      val contrib = edges
        .join(ranks, col("src") === col("node"))
        .join(outdeg, "src")
        .select(col("dst"),
          (col("rank_micro") / col("outdeg")).cast("long").as("c"))
        .groupBy("dst").agg(sum("c").as("in_micro"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (lit(150000L) + (lit(850000L) * coalesce(col("in_micro"), lit(0L))
            / lit(1000000L)).cast("long")).as("rank_micro"))
      val rr = ranks
      t(s"after round $r cumulative") { sink(rr) }
    }

    spark.stop()
  }
}

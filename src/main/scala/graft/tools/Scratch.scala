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

    val docs0 = Tables.loadParallel(spark, dir, "documents")
    t("warm: docs count") { println(docs0.count()) }

    val shingleExpr =
      """array_distinct(transform(sequence(1, greatest(size(tokens)-2, 1)),
         j -> concat(element_at(tokens, j), ' ',
                     coalesce(element_at(tokens, j+1), ''), ' ',
                     coalesce(element_at(tokens, j+2), ''))))"""
    val docs = docs0
      .withColumn("tokens", expr("split(lower(trim(text)), ' +')"))
      .withColumn("shingles", expr(shingleExpr))
      .select(col("doc_id"), col("lang"), col("shingles"))

    val sh = docs.select(col("doc_id"), col("lang"),
      explode(col("shingles")).as("sh"))
    sh.explain("formatted")
    t("explode as-is") { sink(sh) }

    // variant A: barrier the shingle projection from the generate
    val docsCached = docs.persist()
    val shA = docsCached.select(col("doc_id"), col("lang"),
      explode(col("shingles")).as("sh"))
    t("explode after persist") { sink(shA) }
    docsCached.unpersist(blocking = true)

    // variant B: sliding-window shingles via substring-free slice, no HOF in generate
    val shB = docs0
      .withColumn("tokens", expr("split(lower(trim(text)), ' +')"))
      .select(col("doc_id"), col("lang"),
        explode(expr(shingleExpr.replace("tokens", "tokens"))).as("sh"))
    t("explode inline expr") { sink(shB) }

    spark.stop()
  }
}

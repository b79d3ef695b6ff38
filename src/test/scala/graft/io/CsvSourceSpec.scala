package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** S9 — the CSV monitoring source (`index_counts.ipynb` cells 1-2:
  * `pd.read_csv` + date parse): header CSV round-trip with an explicit
  * schema and a to_date parse, feeding the same per-day count matrix
  * the notebook plots.
  */
class CsvSourceSpec extends SparkSpec {

  test("header CSV round-trips with schema and date parsing") {
    val out = tmpDir("csv")
    val daily = graft.core.Tables.load(spark, sfDir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .count()
    daily.coalesce(1).write.option("header", "true").csv(s"$out/counts")

    val schema = StructType(Seq(
      StructField("day", StringType),
      StructField("event_type", StringType),
      StructField("count", LongType)))
    val back = spark.read.option("header", "true").schema(schema)
      .csv(s"$out/counts")
      .withColumn("date", to_date(col("day"), "yyyy-MM-dd"))

    assert(back.count() == daily.count())
    assert(back.filter(col("date").isNull).isEmpty)
    val total = back.agg(sum("count")).collect()(0).getLong(0)
    assert(total == graft.core.Tables.load(spark, sfDir, "events").count())
  }
}

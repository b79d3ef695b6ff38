package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  test("compaction merges small files without changing the data") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = spark.range(1, 10001).toDF("id")
      .withColumn("payload", md5(col("id").cast("string")))
    df.repartition(64).write.parquet(dir)

    val before = spark.read.parquet(dir)
    val beforeSum = before.agg(sum("id")).first().getLong(0)

    val report = Compaction.compact(spark, dir, targetBytes = 64L * 1024 * 1024)

    assert(report.filesBefore == 64)
    assert(report.filesAfter < 64)
    assert(report.rows == 10000L)
    val after = spark.read.parquet(dir)
    assert(after.count() == 10000L)
    assert(after.agg(sum("id")).first().getLong(0) == beforeSum)
    assert(after.columns.sorted.sameElements(Array("id", "payload")))
  }

  test("already-compact table is a no-op") {
    val dir = Files.createTempDirectory("compact2").toString + "/t"
    spark.range(1, 101).toDF("id").coalesce(1).write.parquet(dir)
    val r = Compaction.compact(spark, dir, targetBytes = 128L * 1024 * 1024)
    assert(r.filesBefore == 1 && r.filesAfter == 1 && r.rows == 100L)
  }
}

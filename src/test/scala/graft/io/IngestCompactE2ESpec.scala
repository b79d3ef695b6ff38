package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operational composition: incremental day-partition ingest (many
  * small files per day, as real micro-batch sinks produce) followed by
  * a compaction sweep — the maintenance loop a 100 TB table actually
  * runs. Asserts the ledger, the data, and the file counts all
  * survive the composition.
  */
class IngestCompactE2ESpec extends SparkSpec {

  test("ingest increments, compact, ingest more - data and ledger intact") {
    val src = tmpDir("e2e-src")
    val out = tmpDir("e2e-out") + "/table"
    val ledger = tmpDir("e2e-led") + "/ledger.txt"

    def writeDay(dt: String, n: Int): Unit =
      spark.range(n).toDF("id")
        .repartition(8) // deliberately fragmented, 8 files per day
        .write.mode("overwrite").parquet(s"$src/dt=$dt")

    def ingest(): Seq[String] =
      Incremental.processNew(spark, src, "dt", ledger) { (dt, df) =>
        IdempotentWriter.partitionRefresh(df, out, "dt")
      }

    writeDay("2024-01-01", 100)
    writeDay("2024-01-02", 200)
    assert(ingest() == Seq("2024-01-01", "2024-01-02"))
    assert(spark.read.parquet(out).count() == 300)

    // compact per partition (preserves the dt= layout and with it
    // partition pruning + dynamic partition overwrite)
    val reports = Compaction.compactPartitions(spark, out, "dt",
      targetBytes = 256L * 1024 * 1024)
    assert(reports.keySet == Set("2024-01-01", "2024-01-02"))
    assert(reports.values.map(_.rows).sum == 300)
    assert(reports.values.forall(r => r.filesAfter < r.filesBefore))

    // a new day arrives after compaction: ledger still diffs correctly
    writeDay("2024-01-03", 50)
    assert(ingest() == Seq("2024-01-03"))
    val finalDf = spark.read.parquet(out)
    assert(finalDf.count() == 350)
    assert(finalDf.groupBy("dt").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap ==
      Map("2024-01-01" -> 100L, "2024-01-02" -> 200L, "2024-01-03" -> 50L))
  }
}

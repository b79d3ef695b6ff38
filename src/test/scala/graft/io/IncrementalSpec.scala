package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {

  private def nation = graft.core.Tables.load(spark, sfDir, "nation")

  test("only new partitions are processed; re-runs are no-ops; crash replays are safe") {
    val base = tmpDir("incr")
    val src = s"$base/src"; val out = s"$base/out"; val ledger = s"$base/ledger"

    nation.withColumn("dt", lit("20240101"))
      .write.partitionBy("dt").mode("append").parquet(src)
    nation.limit(5).withColumn("dt", lit("20240102"))
      .write.partitionBy("dt").mode("append").parquet(src)

    def run(): Seq[String] =
      Incremental.processNew(spark, src, "dt", ledger) { (dt, df) =>
        assert(df.columns.contains("dt"))
        IdempotentWriter.partitionRefresh(df, out, "dt")
      }

    assert(run() == Seq("20240101", "20240102"))
    assert(spark.read.parquet(out).count() == 30)
    // second run: nothing new
    assert(run().isEmpty)

    // new partition arrives -> only it is processed
    nation.limit(3).withColumn("dt", lit("20240103"))
      .write.partitionBy("dt").mode("append").parquet(src)
    assert(run() == Seq("20240103"))
    assert(spark.read.parquet(out).count() == 33)

    // crash before ledger commit: wipe the ledger entry, re-run — the
    // idempotent partition sink absorbs the replay without duplicates
    Incremental.processed(spark, ledger) // readable
    val f = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(ledger), false)
    assert(run().size == 3)
    assert(spark.read.parquet(out).count() == 33)
  }

  test("a failing job leaves the ledger uncommitted") {
    val base = tmpDir("incr-fail")
    val src = s"$base/src"; val ledger = s"$base/ledger"
    nation.withColumn("dt", lit("20240101"))
      .write.partitionBy("dt").mode("append").parquet(src)
    intercept[RuntimeException] {
      Incremental.processNew(spark, src, "dt", ledger) { (_, _) =>
        throw new RuntimeException("boom")
      }
    }
    assert(Incremental.processed(spark, ledger).isEmpty)
    // next run retries the partition
    val done = Incremental.processNew(spark, src, "dt", ledger) { (_, _) => () }
    assert(done == Seq("20240101"))
  }
}

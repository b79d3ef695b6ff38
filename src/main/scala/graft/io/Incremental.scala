package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental (high-water-mark) batch processing.
  *
  * The reference processes "yesterday's partition" by convention: the
  * DAG computes `param_date` = yesterday KST and every job filters on
  * it (`Airflow_week.py:26-29,303-322`). That convention silently
  * skips work when a run is missed and reprocesses nothing on
  * backfill. This operator makes the contract explicit: a processed-
  * partition ledger next to the output; each run diffs the source's
  * partition listing against the ledger and processes only the new
  * ones, committing the ledger AFTER the write so a crashed run
  * re-processes (idempotent sinks — K1 — make that safe).
  *
  * Scale shape: the diff is metadata-only (one FS listing, no data
  * scan); each new partition is then one bounded job over that
  * partition's data. A 100 TB table with 3 new day-partitions does 3
  * partition-sized jobs, never a full-table scan.
  */
object Incremental {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Partition values present under `srcDir` for `partCol` (listing only). */
  def sourcePartitions(spark: SparkSession, srcDir: String,
                       partCol: String): Seq[String] = {
    val base = new Path(srcDir)
    val f = fs(spark, srcDir)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol=")).map(_.stripPrefix(s"$partCol=")).sorted
  }

  /** Already-processed partition values from the ledger file. */
  def processed(spark: SparkSession, ledgerPath: String): Set[String] = {
    val p = new Path(ledgerPath)
    val f = fs(spark, ledgerPath)
    if (!f.exists(p)) Set.empty
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .split("\n").map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  private def writeLedger(spark: SparkSession, ledgerPath: String,
                          values: Set[String]): Unit = {
    val f = fs(spark, ledgerPath)
    val tmp = new Path(ledgerPath + ".tmp")
    val out = f.create(tmp, true)
    try out.write(values.toSeq.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.delete(new Path(ledgerPath), false)
    f.rename(tmp, new Path(ledgerPath))
  }

  /** Process every source partition not yet in the ledger.
    * `job` receives (partitionValue, thatPartitionOnly-DataFrame); the
    * ledger commits only after ALL new partitions succeeded.
    *
    * @return the partition values processed this run.
    */
  def processNew(spark: SparkSession, srcDir: String, partCol: String,
                 ledgerPath: String)
                (job: (String, DataFrame) => Unit): Seq[String] = {
    val have = processed(spark, ledgerPath)
    val fresh = sourcePartitions(spark, srcDir, partCol).filterNot(have)
    fresh.foreach { v =>
      // basePath keeps the partition column in the frame's schema
      val part = spark.read.option("basePath", srcDir)
        .parquet(s"$srcDir/$partCol=$v")
      job(v, part)
    }
    if (fresh.nonEmpty) writeLedger(spark, ledgerPath, have ++ fresh)
    fresh
  }
}

package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SchemaUtil

/** O6/O7/O8 — backup-with-date-column, DDL-drift gate, and retention
  * sweep (`BkupRs.py:123-166,222-280,171-207`; `S3Delete.py:29-53`).
  *
  * Layout: `baseDir/<table>/bkup_dt=<yyyyMMdd>/…` — a date-partitioned
  * parquet table. Backup day N is one dynamic-partition overwrite
  * (idempotent re-runs), retention is a partition-directory drop — no
  * rewrite of surviving data, which is what makes this viable on a
  * 100 TB backup set.
  */
object Backup {

  /** O7: `select '<d>' as bkup_dt, *` appended into the backup table,
    * after the O6 drift gate (source columns must equal backup columns
    * minus `bkup_dt`, `BkupRs.py:128-152`).
    */
  def backup(df: DataFrame, baseDir: String, table: String, bkupDt: String): Long = {
    val spark = df.sparkSession
    val target = s"$baseDir/$table"
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(target))) {
      val existing = spark.read.parquet(target).schema
      SchemaUtil.assertSameColumns(df.schema, existing, ignoreInBkp = Set("bkup_dt"))
    }
    val stamped = df.withColumn("bkup_dt", lit(bkupDt))
    IdempotentWriter.partitionRefresh(stamped, target, "bkup_dt")
  }

  /** Dates currently present in the backup table (partition listing —
    * metadata only, no data scan).
    */
  def backupDates(spark: SparkSession, baseDir: String, table: String): Seq[String] = {
    val p = new Path(s"$baseDir/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("bkup_dt="))
      .map(_.stripPrefix("bkup_dt="))
      .sorted
  }

  /** O8/K7: drop partitions strictly older than `cutoffDt` (the
    * reference's `delete … where bkup_dt < to_char(now()+9h − N days,
    * 'yyyyMMdd')`, `BkupRs.py:246`). Returns the dropped dates.
    */
  def retentionSweep(spark: SparkSession, baseDir: String, table: String,
                     cutoffDt: String): Seq[String] = {
    val base = new Path(s"$baseDir/$table")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = backupDates(spark, baseDir, table).filter(_ < cutoffDt)
    victims.foreach(d => fs.delete(new Path(base, s"bkup_dt=$d"), true))
    victims
  }
}

package graft.io

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** K6 — the reference's 9-column batch audit log, written after every
  * job on both success and failure paths (`comlib.py:386-408`;
  * populated from `AWS_GLUE_ETL.py:66-76,138-162`,
  * `log_screen.py:79-89,321-351`, `BkupRs.py:89-99`,
  * `Elastic_indexing.py:79-89`, `Keyword.py:113-123`).
  *
  * Column names — including the reference's `taget_tbl_nm` spelling —
  * are preserved as the schema contract. Single-row appends; the log
  * table is tiny by construction and append-only (K1 append
  * semantics).
  */
object RunLog {

  case class Entry(
      bat_dt: String,
      bat_req_tm: String,
      job_nm: String,
      taget_tbl_nm: String,
      cretn_cnt: Long,
      success_yn: String,
      error_msg: String,
      job_run_id: String,
      platform_dt: Timestamp)

  def append(spark: SparkSession, path: String, e: Entry): Unit = {
    import spark.implicits._
    Seq(e).toDF().write.mode(SaveMode.Append).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

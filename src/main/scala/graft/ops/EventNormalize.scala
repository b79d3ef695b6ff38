package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** EP3 — the reference's search-log normalization
  * (`Talent_Opportunity_Platform/log_screen.py:240-294`): an ingested
  * log table registered as a temp view and normalized by a single
  * `spark.sql` text — nvl defaults on every column (P1/F1), a nested
  * LIKE-driven CASE canonicalizing the label column (F7), timestamp
  * reconstruction from string parts (F4), and the KST (+9h) date stamp
  * (F5). Running it as SQL text — not DataFrame calls — mirrors the
  * reference's S2/S5 surface where query strings are fetched and
  * executed verbatim.
  *
  * At scale this is a pure map stage: no shuffle, codegen'd end to end,
  * and the projection prunes the parquet scan to the referenced
  * columns.
  */
object EventNormalize {

  /** Spark SQL text over the registered `events` view. */
  val sql: String = """
    SELECT
      event_id,
      lpad(CAST(user_id AS STRING), 6, '0')            AS user_key,
      CASE
        WHEN event_type LIKE 'cli%'  OR event_type LIKE 'vie%' THEN 'BROWSE'
        WHEN event_type LIKE '%chase' OR event_type = 'signup' THEN 'CONVERT'
        WHEN event_type = 'error'                              THEN 'ERROR'
        ELSE 'OTHER'
      END                                              AS event_label,
      nvl(value, 0.0)                                  AS value_filled,
      CASE WHEN nvl(value, 0.0) < 10.0  THEN 'low'
           WHEN nvl(value, 0.0) < 100.0 THEN 'mid'
           ELSE 'high' END                             AS value_bucket,
      CAST(get_json_object(props, '$.k') AS BIGINT)    AS prop_k,
      date_format(ts, 'yyyyMMdd')                      AS event_date,
      date_format(ts + INTERVAL 9 HOURS, 'yyyyMMdd')   AS kst_date
    FROM events"""

  def normalize(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(sql)
  }

  /** DuckDB oracle — same semantics in DuckDB dialect (no nvl /
    * get_json_object there; coalesce + regexp_extract instead).
    */
  val oracle: String = """
    SELECT
      event_id,
      lpad(CAST(user_id AS VARCHAR), 6, '0')           AS user_key,
      CASE
        WHEN event_type LIKE 'cli%'  OR event_type LIKE 'vie%' THEN 'BROWSE'
        WHEN event_type LIKE '%chase' OR event_type = 'signup' THEN 'CONVERT'
        WHEN event_type = 'error'                              THEN 'ERROR'
        ELSE 'OTHER'
      END                                              AS event_label,
      coalesce(value, 0.0)                             AS value_filled,
      CASE WHEN coalesce(value, 0.0) < 10.0  THEN 'low'
           WHEN coalesce(value, 0.0) < 100.0 THEN 'mid'
           ELSE 'high' END                             AS value_bucket,
      CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS prop_k,
      strftime(ts, '%Y%m%d')                           AS event_date,
      strftime(ts + INTERVAL 9 HOUR, '%Y%m%d')         AS kst_date
    FROM events"""
}

package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative data-quality checks — the engine-level generalization of
  * the reference's scattered runtime gates: the row-count gate
  * (`log_screen.py:305`), the empty-input skip (`BkupRs.py:255-260`),
  * the DDL-drift assertion (`BkupRs.py:123-166`), and the implicit
  * Y/N-domain and not-null assumptions its queries make
  * (`Elastic_indexing.py:109-130`'s 22 nvl-wrapped columns).
  *
  * Execution shape: ALL checks against a table evaluate in ONE
  * aggregate pass (a single shuffle-free partial+final aggregate, no
  * matter how many constraints), returning a small report frame —
  * constraint, violation count, total rows, pass flag. At 100 TB you
  * pay one scan for the whole constraint suite, and the report row
  * feeds the K6 run-log / O4 gate exactly like a count gate does.
  */
object Checks {

  /** One constraint: a name and a violation predicate (true = bad row). */
  final case class Check(name: String, violation: Column)

  def notNull(c: String): Check =
    Check(s"not_null_$c", col(c).isNull)

  def inSet(c: String, values: Seq[String]): Check =
    Check(s"accepted_values_$c", !col(c).isin(values: _*) || col(c).isNull)

  def nonNegative(c: String): Check =
    Check(s"non_negative_$c", col(c) < 0)

  def matches(c: String, regex: String): Check =
    Check(s"matches_$c", !col(c).rlike(regex) || col(c).isNull)

  /** Uniqueness needs count-distinct, not a per-row predicate — handled
    * as a dedicated aggregate in [[report]]. */
  final case class Unique(cols: Seq[String]) {
    def name: String = s"unique_${cols.mkString("_")}"
  }

  /** Evaluate every check in one aggregate pass; returns
    * (constraint, violations, total, passed). */
  def report(df: DataFrame, checks: Seq[Check],
             uniques: Seq[Unique] = Nil): DataFrame = {
    val rowAggs: Seq[Column] =
      count(lit(1)).as("__total") +:
      checks.map(c => sum(when(c.violation, 1L).otherwise(0L)).as(c.name)) ++:
      uniques.map(u =>
        (count(lit(1)) - countDistinct(struct(u.cols.map(col): _*))).as(u.name))
    val agged = df.agg(rowAggs.head, rowAggs.tail: _*)
    val names = checks.map(_.name) ++ uniques.map(_.name)
    val entries = names.map(n =>
      s"struct('$n' as constraint, $n as violations)").mkString(", ")
    agged.select(col("__total"), explode(expr(s"array($entries)")).as("e"))
      .select(
        col("e.constraint").as("constraint"),
        col("e.violations").as("violations"),
        col("__total").as("total"),
        (col("e.violations") === 0L).as("passed"))
  }

  // =========================================================================
  // q32 — the orders constraint suite as an oracle query
  // =========================================================================

  val q32DqReport: (SparkSession, String) => DataFrame = (s, dir) =>
    report(
      Tables.load(s, dir, "orders"),
      Seq(
        notNull("o_custkey"),
        inSet("o_orderstatus", Seq("O", "F", "P")),
        nonNegative("o_totalprice"),
        matches("o_orderpriority", "^[1-5]-")),
      Seq(Unique(Seq("o_orderkey"))))

  val q32DqReportSql: String = """
    WITH m AS (
      SELECT count(*) AS total,
        CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS not_null_o_custkey,
        CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS accepted_values_o_orderstatus,
        CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS non_negative_o_totalprice,
        CAST(sum(CASE WHEN o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS matches_o_orderpriority,
        count(*) - count(DISTINCT o_orderkey) AS unique_o_orderkey
      FROM orders)
    SELECT 'not_null_o_custkey' AS constraint, not_null_o_custkey AS violations, total, not_null_o_custkey = 0 AS passed FROM m
    UNION ALL SELECT 'accepted_values_o_orderstatus', accepted_values_o_orderstatus, total, accepted_values_o_orderstatus = 0 FROM m
    UNION ALL SELECT 'non_negative_o_totalprice', non_negative_o_totalprice, total, non_negative_o_totalprice = 0 FROM m
    UNION ALL SELECT 'matches_o_orderpriority', matches_o_orderpriority, total, matches_o_orderpriority = 0 FROM m
    UNION ALL SELECT 'unique_o_orderkey', unique_o_orderkey, total, unique_o_orderkey = 0 FROM m"""

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q32_dq_report" -> q32DqReport)
  val oracleSql: Map[String, String] =
    Map("q32_dq_report" -> q32DqReportSql)
}

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

  /** Row-level quarantine split — the enforcement half of [[report]]:
    * rows violating ANY per-row check go to a quarantine frame carrying
    * the sorted list of violated constraint names (`__violations`),
    * clean rows pass through column-identical. One pass, no shuffle —
    * each predicate is evaluated inline in the same projection, so the
    * split costs one filter each over a shared scan (Catalyst reuses
    * the subplan under whole-stage codegen). Uniqueness is deliberately
    * NOT a quarantine criterion: "which of the duplicates is the bad
    * one" is survivorship (d10's job), not row validity.
    *
    * The production loop: quarantine → K6-style audit row with the
    * violation counts ([[report]]) → clean side feeds the pipeline,
    * quarantined side lands in a side table for triage.
    */
  def quarantine(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "quarantine needs at least one check")
    val reasons = array_sort(concat(checks.map(c =>
      when(c.violation, array(lit(c.name))).otherwise(array())): _*))
    val tagged = df.withColumn("__violations", reasons)
    (tagged.filter(size(col("__violations")) === 0).drop("__violations"),
      tagged.filter(size(col("__violations")) > 0))
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

  // =========================================================================
  // q68 — distribution drift (PSI) between two event populations
  // =========================================================================

  /** Population-stability-index drift monitoring — the DQ check that
    * catches "the data changed shape" when every q32-style constraint
    * still passes: event values bucketed into 10 equal-width bins,
    * the first half of the time range (baseline) against the second
    * (current), add-one smoothed. Per-bucket PSI contribution
    * `(pa−pb)·ln(pa/pb)` is quantized to integer micros from exact
    * integer counts — both engines compute identical doubles from
    * identical longs, and no float SUM happens (the total is the
    * reader's integer sum). Plan: one scan, one 20-cell aggregate (10
    * buckets × 2 sides via conditional sums), broadcast midpoint row;
    * drift over 100 TB of events costs one pass.
    */
  val q68DriftReport: (SparkSession, String) => DataFrame = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val mid = ev.agg(
      ((min(unix_millis(col("ts"))) + max(unix_millis(col("ts")))) / 2)
        .cast("long").as("mid_ms"))
    val bucketed = ev.crossJoin(broadcast(mid))
      .select(
        least(floor(col("value") / 50.0), lit(9)).cast("int").as("bucket"),
        (unix_millis(col("ts")) < col("mid_ms")).as("is_base"))
      .groupBy("bucket")
      .agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_cur"))
    val tot = bucketed.agg(sum("n_base").as("tb"), sum("n_cur").as("tc"))
    bucketed.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        expr("""cast(round(1e6 *
            ((n_base + 1) / cast(tb + 10 as double) - (n_cur + 1) / cast(tc + 10 as double)) *
            ln(((n_base + 1) / cast(tb + 10 as double)) / ((n_cur + 1) / cast(tc + 10 as double)))
          ) as bigint)""").as("psi_micro"))
  }

  val q68DriftReportSql: String = """
    WITH mid AS (
      SELECT CAST((min(epoch_ms(ts)) + max(epoch_ms(ts))) / 2 AS BIGINT) AS mid_ms
      FROM events),
    b AS (
      SELECT CAST(least(floor(value / 50.0), 9) AS INT) AS bucket,
             epoch_ms(ts) < mid_ms AS is_base
      FROM events CROSS JOIN mid),
    g AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
             CAST(SUM(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM b GROUP BY 1),
    t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb, CAST(SUM(n_cur) AS BIGINT) AS tc FROM g)
    SELECT bucket, n_base, n_cur,
           CAST(round(1e6 *
             ((n_base + 1) / CAST(tb + 10 AS DOUBLE) - (n_cur + 1) / CAST(tc + 10 AS DOUBLE)) *
             ln(((n_base + 1) / CAST(tb + 10 AS DOUBLE)) / ((n_cur + 1) / CAST(tc + 10 AS DOUBLE)))
           ) AS BIGINT) AS psi_micro
    FROM g CROSS JOIN t"""

  // =========================================================================
  // q87 — cross-table referential integrity
  // =========================================================================

  /** The constraint class q32's one-pass suite cannot express: foreign
    * keys (an orphan is only visible through a join) and cross-TABLE
    * ordering (a lineitem shipped before its order was placed). All checks against one child table FUSE into a single
    * pass — lineitem scans once, LEFT-joins both parents' key
    * projections, and one aggregate counts every violation class
    * (orders does the same against customer) — so the suite costs one
    * keyed shuffle per (child, parent) pair, not one per check, and
    * parent sides are distinct key projections that broadcast when
    * small. Same report schema as q32, so both suites union into one
    * gate feed.
    */
  val q87ReferentialIntegrity: (SparkSession, String) => DataFrame = (s, dir) => {
    def reportRows(agged: DataFrame, names: Seq[String]): DataFrame = {
      val entries = names.map(n =>
        s"struct('$n' as constraint, $n as violations)").mkString(", ")
      agged.select(col("__total"), explode(expr(s"array($entries)")).as("e"))
        .select(
          col("e.constraint").as("constraint"),
          col("e.violations").as("violations"),
          col("__total").as("total"),
          (col("e.violations") === 0L).as("passed"))
    }
    val li = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_shipdate")
    val o = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_orderdate").distinct()
    val p = Tables.load(s, dir, "part").select("p_partkey").distinct()
    val liChecks = reportRows(
      li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
        .join(p, col("l_partkey") === col("p_partkey"), "left")
        .agg(
          count(lit(1)).as("__total"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .as("fk_lineitem_orders"),
          sum(when(col("p_partkey").isNull, 1L).otherwise(0L))
            .as("fk_lineitem_part"),
          sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
            .as("ship_not_before_order")),
      Seq("fk_lineitem_orders", "fk_lineitem_part",
        "ship_not_before_order"))
    val c = Tables.load(s, dir, "customer").select("c_custkey").distinct()
    val oChecks = reportRows(
      Tables.load(s, dir, "orders").select("o_custkey")
        .join(c, col("o_custkey") === col("c_custkey"), "left")
        .agg(
          count(lit(1)).as("__total"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
            .as("fk_orders_customer")),
      Seq("fk_orders_customer"))
    liChecks.unionByName(oChecks)
  }

  val q87ReferentialIntegritySql: String = """
    WITH li AS (
      SELECT count(*) AS total,
        CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_lineitem_orders,
        CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_lineitem_part,
        CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS ship_not_before_order
      FROM lineitem l
      LEFT JOIN (SELECT DISTINCT o_orderkey, o_orderdate FROM orders) o ON l.l_orderkey = o.o_orderkey
      LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p ON l.l_partkey = p.p_partkey),
    o AS (
      SELECT count(*) AS total,
        CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_orders_customer
      FROM orders r
      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON r.o_custkey = c.c_custkey)
    SELECT 'fk_lineitem_orders' AS constraint, fk_lineitem_orders AS violations, total, fk_lineitem_orders = 0 AS passed FROM li
    UNION ALL SELECT 'fk_lineitem_part', fk_lineitem_part, total, fk_lineitem_part = 0 FROM li
    UNION ALL SELECT 'ship_not_before_order', ship_not_before_order, total, ship_not_before_order = 0 FROM li
    UNION ALL SELECT 'fk_orders_customer', fk_orders_customer, total, fk_orders_customer = 0 FROM o"""

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q32_dq_report" -> q32DqReport, "q68_drift_report" -> q68DriftReport,
      "q87_referential_integrity" -> q87ReferentialIntegrity)
  val oracleSql: Map[String, String] =
    Map("q32_dq_report" -> q32DqReportSql, "q68_drift_report" -> q68DriftReportSql,
      "q87_referential_integrity" -> q87ReferentialIntegritySql)
}

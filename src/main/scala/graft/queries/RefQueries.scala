package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.EventNormalize

/** Reference-surface operators beyond the round-1 six — each entry maps
  * a SURVEY.md §2 row onto TESTDATA with a DuckDB oracle.
  *
  * Determinism: money through long cents, lists pinned with
  * sort_array, top-1 pinned with ORDER BY on a unique key.
  */
object RefQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** EP3 — SQL-text normalization (S2/S5/P1/F1/F4/F5/F7/F13/F14). */
  val q7EventNormalize: Q = (s, dir) => EventNormalize.normalize(s, dir)

  /** J3 — left-semi join: customers that have at least one order.
    * At scale: semi-join shuffles only the distinct keys of the right
    * side; no payload columns cross the wire.
    */
  val q8SemiJoin: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  val q8SemiJoinSql: String = """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""

  /** Anti join — customers with no orders (SURVEY §2.4 notes these come
    * free from Catalyst even though the reference never used one).
    */
  val q9AntiJoin: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  val q9AntiJoinSql: String = """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""

  /** A6 — the monitoring count matrix (`index_counts.ipynb`): one row
    * per date, one column per event type. Explicit pivot value list =
    * no extra distinct-values job; single shuffle on the date key.
    */
  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  val q10PivotCounts: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyyMMdd").as("event_date"))
      .pivot("event_type", eventTypes)
      .count()
      .na.fill(0, eventTypes)

  val q10PivotCountsSql: String = """
    SELECT strftime(ts, '%Y%m%d') AS event_date,
      count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
      count(CASE WHEN event_type = 'view'     THEN 1 END) AS view,
      count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
      count(CASE WHEN event_type = 'error'    THEN 1 END) AS error
    FROM events GROUP BY 1"""

  /** K7/F3/F5/F6 — the retention predicate: KST(+9h) date string versus
    * a cutoff, exactly the reference's
    * `to_char(platform_dt + interval '9 hours','yyyyMMdd') < cutoff`
    * (`BkupRs.py:246`). On a date-partitioned layout this prunes
    * partitions instead of scanning.
    */
  val q11RetentionCutoff: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("kst_date",
        date_format(col("ts") + expr("INTERVAL 9 HOURS"), "yyyyMMdd"))
      .filter(col("kst_date") < "20240115")
      .select("event_id", "user_id", "kst_date")

  val q11RetentionCutoffSql: String = """
    SELECT event_id, user_id, strftime(ts + INTERVAL 9 HOUR, '%Y%m%d') AS kst_date
    FROM events
    WHERE strftime(ts + INTERVAL 9 HOUR, '%Y%m%d') < '20240115'"""

  /** P9/O7 — backup projection: constant bkup_dt column + `*`
    * (`BkupRs.py:234-238`).
    */
  val q12BackupProjection: Q = (s, dir) =>
    t(s, dir, "nation").select(lit("20240131").as("bkup_dt"), col("*"))

  val q12BackupProjectionSql: String =
    "SELECT '20240131' AS bkup_dt, * FROM nation"

  /** F4 — timestamp reconstruction from string parts, the reference's
    * `to_timestamp(substr(..)||'-'||substr(..)…)` with a sentinel
    * default (`log_screen.py:292`).
    */
  val q13TimestampParse: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("raw", coalesce(
        date_format(col("ts"), "yyyyMMdd HH:mm:ss"), lit("99991231 00:00:00")))
      .select(col("event_id"),
        to_timestamp(concat(
          substring(col("raw"), 1, 4), lit("-"),
          substring(col("raw"), 5, 2), lit("-"),
          substring(col("raw"), 7, 2), lit(" "),
          substring(col("raw"), 10, 8))).as("parsed_ts"))

  val q13TimestampParseSql: String = """
    WITH r AS (SELECT event_id,
                      coalesce(strftime(ts, '%Y%m%d %H:%M:%S'), '99991231 00:00:00') AS raw
               FROM events)
    SELECT event_id,
           strptime(substr(raw,1,4) || '-' || substr(raw,5,2) || '-' ||
                    substr(raw,7,2) || ' ' || substr(raw,10,8),
                    '%Y-%m-%d %H:%M:%S') AS parsed_ts
    FROM r"""

  /** P7 — multi-field contains search (`openai_elasticsearch.py:160-198`
    * `query_string` over several fields).
    */
  val q14TextSearch: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    val terms = Seq("spark", "shuffle")
    val pred = terms.map(w => col("text").contains(w)).reduce(_ || _) ||
      col("source") === "src7"
    d.filter(pred).select("doc_id", "lang", "source", "n_chars")
  }

  val q14TextSearchSql: String = """
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE text LIKE '%spark%' OR text LIKE '%shuffle%' OR source = 'src7'"""

  /** Nested-document assembly — the ES `nested` field model
    * (`openai_elasticsearch.py:51-54`): per-customer array of order
    * sub-documents. sort_array pins the list order the reference's
    * driver-side dict build left to arrival order.
    */
  val q15NestedDocs: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_custkey"),
        struct(col("o_orderkey").as("okey"),
               cents(col("o_totalprice")).as("price_cents")).as("o"))
      .groupBy("o_custkey")
      // The nested array<struct> is built distributed (sort_array pins
      // order on the unique okey), then canonicalized to
      // "okey:cents|okey:cents|..." — the oracle harness hash-compares
      // cell values and cannot hash array-typed cells.
      .agg(array_join(
             transform(sort_array(collect_list(col("o"))),
               o => concat(o.getField("okey").cast("string"), lit(":"),
                           o.getField("price_cents").cast("string"))),
             "|").as("nested_orders"),
           count(lit(1)).as("n_orders"))

  val q15NestedDocsSql: String = """
    SELECT o_custkey,
           string_agg(o_orderkey || ':' ||
                      CAST(round(o_totalprice*100) AS BIGINT),
                      '|' ORDER BY o_orderkey) AS nested_orders,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey"""

  /** W3/W4 — deterministic top-1 (the reference's "latest index by
    * reverse sort, take head", `log_screen.py:122-127`).
    */
  val q16Top1Sorted: Q = (s, dir) =>
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(1)
      .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("price_cents"))

  val q16Top1SortedSql: String = """
    SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 1"""

  /** Rollup with grouping_id — subtotal/total rows the reference's
    * monitoring would want; Catalyst expands to one Expand + one
    * aggregate (no N-pass scan).
    */
  val q18Rollup: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(cents(col("l_quantity"))).as("qty_cents"),
        grouping_id().as("gid"))
  }

  val q18RollupSql: String = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents,
           GROUPING(l_returnflag, l_linestatus) AS gid
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

  /** INTERSECT / EXCEPT (absent from the reference, SURVEY §2.7 —
    * completes the set-op family): customers in BUILDING vs with-orders.
    */
  val q19SetOps: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val withOrders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey")).distinct()
    building.intersect(withOrders)
      .withColumn("tag", lit("both"))
      .unionByName(building.exceptAll(withOrders).withColumn("tag", lit("no_orders")))
  }

  val q19SetOpsSql: String = """
    SELECT c_custkey, 'both' AS tag FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS tag FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT ALL
      SELECT DISTINCT o_custkey FROM orders)"""

  /** Correlated scalar subquery — customers above their nation's
    * average balance (cents-exact): Catalyst de-correlates into an
    * aggregate + join, the shape the reference pushed to Redshift.
    */
  val q20CorrelatedSubquery: Q = (s, dir) => {
    val c = t(s, dir, "customer")
      .withColumn("bal_cents", cents(col("c_acctbal")))
    val natAvg = c.groupBy("c_nationkey")
      .agg((sum("bal_cents") / count(lit(1))).as("avg_cents"))
    c.join(broadcast(natAvg), Seq("c_nationkey"))
      .filter(col("bal_cents") > col("avg_cents"))
      .select("c_custkey", "c_nationkey", "bal_cents")
  }

  val q20CorrelatedSubquerySql: String = """
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
    FROM customer c
    WHERE CAST(round(c_acctbal*100) AS BIGINT) > (
      SELECT CAST(SUM(CAST(round(c2.c_acctbal*100) AS BIGINT)) AS DOUBLE) / count(*)
      FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)"""

  /** Window-function family breadth: lag/lead, dense_rank, and a
    * running frame sum in one pass — a single sort per partition key
    * serves all four (same Window spec ⇒ one WindowExec).
    */
  val q23WindowFamily: Q = (s, dir) => {
    val o = t(s, dir, "orders")
      .withColumn("price_cents", cents(col("o_totalprice")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
      col("o_custkey"), col("o_orderkey"), col("price_cents"),
      lag("o_orderkey", 1).over(w).as("prev_orderkey"),
      lead("o_orderkey", 1).over(w).as("next_orderkey"),
      dense_rank().over(w).as("order_seq"),
      sum("price_cents")
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .as("running_cents"))
  }

  val q23WindowFamilySql: String = """
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
           lag(o_orderkey, 1) OVER w AS prev_orderkey,
           lead(o_orderkey, 1) OVER w AS next_orderkey,
           dense_rank() OVER w AS order_seq,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS running_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  /** Exact percentiles per group (Spark `percentile` sorts within the
    * group — fine for bounded groups; the sketch-based
    * `approx_percentile`/KLL is the unbounded-cardinality variant).
    * Linear interpolation on identical sorted cents is the same IEEE
    * arithmetic in both engines.
    */
  val q24Percentiles: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(cast(round(o_totalprice*100) as bigint), 0.5)").as("median_cents"),
        expr("percentile(cast(round(o_totalprice*100) as bigint), 0.9)").as("p90_cents"),
        count(lit(1)).as("n"))

  val q24PercentilesSql: String = """
    SELECT o_orderpriority,
           quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) AS median_cents,
           quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.9) AS p90_cents,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority"""

  /** Range (interval) join — per error event, the user's activity in
    * the following 24 hours; completes the as-of/range family. The
    * equi key (user) bounds the range probe; at scale the production
    * layout adds a coarse time grain to the equi side so the range
    * residual stays per-bucket.
    */
  val q25RangeJoin: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
    errors.join(e,
        col("err_user") === col("user_id") &&
        col("ts") > col("err_ts") &&
        col("ts") <= col("err_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy("err_id")
      .agg(count(lit(1)).as("n_following"))
  }

  val q25RangeJoinSql: String = """
    SELECT a.event_id AS err_id, count(*) AS n_following
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 24 HOUR
    WHERE a.event_type = 'error'
    GROUP BY a.event_id"""

  /** Batch event-time tumbling windows — the `window()` aggregation
    * the streaming path uses (`ExactlyOnce.windowedCounts`), here as a
    * daily batch over the same events (the reference's M4 reprocess
    * shape). One shuffle on the window start.
    */
  val q26TumblingWindows: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value*100) as bigint)")).as("sum_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_cents"))

  val q26TumblingWindowsSql: String = """
    SELECT date_trunc('day', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2"""

  /** Two-level aggregation (TPC-H Q13 shape): per-customer order
    * counts, then the distribution of those counts — including the
    * zero-order customers the left join keeps alive. Two shuffles with
    * strictly shrinking data (rows → customers → distinct counts);
    * the filter rides inside the join condition so the anti-pattern
    * (filter-after-outer-join turning it inner) can't appear.
    */
  val q30OrderCountDist: Q = (s, dir) => {
    val c = t(s, dir, "customer").select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q30OrderCountDistSql: String = """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count"""

  /** F13's modern form: the JSON payload column parsed ONCE into
    * Spark 4's `VariantType` (binary-encoded semi-structured value —
    * cheaper repeated path access than per-path `get_json_object`
    * string re-parsing), then typed path extraction, a predicate on
    * the extracted field, and a grouped aggregate. At scale the
    * variant parse is a map stage and the one shuffle is the 3-group
    * aggregate; with variant *shredding* in the writer the path read
    * becomes a columnar scan.
    */
  val q33VariantExtract: Q = (s, dir) =>
    t(s, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .filter(col("k") >= 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))

  val q33VariantExtractSql: String = """
    SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    WHERE k >= 50
    GROUP BY event_type"""

  /** q48 — the TPC-H Q21 composition (semi + anti self-join on the
    * fact table): suppliers who were the ONLY late supplier on a
    * multi-supplier fulfilled order ("late" = shipped > 90 days after
    * the order date; the synthetic tables carry no commit/receipt
    * dates). Exercises EXISTS + NOT EXISTS with correlated non-equi
    * predicates in one plan: Catalyst runs both as broadcast/shuffled
    * hash joins on l_orderkey with the `suppkey <>` residual — the
    * fact table is never exploded, and at 100 TB all three legs
    * co-partition on orderkey so AQE can pick SMJ with one exchange
    * reused.
    */
  val q48LateSuppliers: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val late = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("l_orderkey", "l_suppkey")
    val others = li.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"))
    val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
      col("l_suppkey").as("o3_suppkey"))
    late
      .join(others,
        col("l_orderkey") === col("o2_orderkey") &&
        col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o3_orderkey") &&
        col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("numwait"))
  }

  val q48LateSuppliersSql: String = """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_suppkey, s_name"""

  val queries: Map[String, Q] = Map(
    "q48_late_suppliers"   -> q48LateSuppliers,
    "q30_order_count_dist" -> q30OrderCountDist,
    "q33_variant_extract"  -> q33VariantExtract,
    "q7_event_normalize"   -> q7EventNormalize,
    "q8_semi_join"         -> q8SemiJoin,
    "q9_anti_join"         -> q9AntiJoin,
    "q10_pivot_counts"     -> q10PivotCounts,
    "q11_retention_cutoff" -> q11RetentionCutoff,
    "q12_backup_projection"-> q12BackupProjection,
    "q13_timestamp_parse"  -> q13TimestampParse,
    "q14_text_search"      -> q14TextSearch,
    "q15_nested_docs"      -> q15NestedDocs,
    "q16_top1_sorted"      -> q16Top1Sorted,
    "q17_sessionize"       -> graft.streaming.Sessionize.q17Sessionize,
    "q31_session_window"   -> graft.streaming.Sessionize.q31SessionWindow,
    "q18_rollup"           -> q18Rollup,
    "q19_set_ops"          -> q19SetOps,
    "q20_correlated_subquery" -> q20CorrelatedSubquery,
    "q21_asof_join"        -> graft.ops.AsOfJoin.q21AsofJoin,
    "q90_asof_native"      -> graft.ops.AsOfJoin.q90AsofNative,
    "q75_last_touch"       -> graft.ops.AsOfJoin.q75LastTouch,
    "q23_window_family"    -> q23WindowFamily,
    "q24_percentiles"      -> q24Percentiles,
    "q25_range_join"       -> q25RangeJoin,
    "q26_tumbling_windows" -> q26TumblingWindows,
  )

  val oracleSql: Map[String, String] = Map(
    "q48_late_suppliers"   -> q48LateSuppliersSql,
    "q30_order_count_dist" -> q30OrderCountDistSql,
    "q33_variant_extract"  -> q33VariantExtractSql,
    "q7_event_normalize"   -> EventNormalize.oracle,
    "q8_semi_join"         -> q8SemiJoinSql,
    "q9_anti_join"         -> q9AntiJoinSql,
    "q10_pivot_counts"     -> q10PivotCountsSql,
    "q11_retention_cutoff" -> q11RetentionCutoffSql,
    "q12_backup_projection"-> q12BackupProjectionSql,
    "q13_timestamp_parse"  -> q13TimestampParseSql,
    "q14_text_search"      -> q14TextSearchSql,
    "q15_nested_docs"      -> q15NestedDocsSql,
    "q16_top1_sorted"      -> q16Top1SortedSql,
    "q17_sessionize"       -> graft.streaming.Sessionize.q17SessionizeSql,
    "q31_session_window"   -> graft.streaming.Sessionize.q31SessionWindowSql,
    "q18_rollup"           -> q18RollupSql,
    "q19_set_ops"          -> q19SetOpsSql,
    "q20_correlated_subquery" -> q20CorrelatedSubquerySql,
    "q21_asof_join"        -> graft.ops.AsOfJoin.q21AsofJoinSql,
    "q90_asof_native"      -> graft.ops.AsOfJoin.q90AsofNativeSql,
    "q75_last_touch"       -> graft.ops.AsOfJoin.q75LastTouchSql,
    "q23_window_family"    -> q23WindowFamilySql,
    "q24_percentiles"      -> q24PercentilesSql,
    "q25_range_join"       -> q25RangeJoinSql,
    "q26_tumbling_windows" -> q26TumblingWindowsSql,
  )
}

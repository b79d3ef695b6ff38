package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.ops.DocAssembly

/** The engine's declared query inventory — the t2 oracle surface.
  *
  * Contract (see /root/repo/SparkEntry + Verify): every entry in
  * [[queries]] is a `(SparkSession, sfDir) => DataFrame`; entries with
  * a matching key in [[oracleSql]] are hash-compared against DuckDB
  * running that SQL over the same parquet tables. Column names are
  * aliased identically on both sides.
  *
  * Determinism rules used throughout (SURVEY.md §7 "What's hard"):
  * aggregate doubles through exact DECIMAL arithmetic and cast the
  * result to double; pin listagg order with sort_array; tie-break
  * window ranks on a unique key.
  */
object Registry {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // =======================================================================
  // Aggregations (SURVEY §2.5)
  // =======================================================================

  /** A-family: grouped pricing summary (partial-agg friendly; at scale
    * this is one shuffle on two low-cardinality keys).
    *
    * Money columns carry ≤2 decimal digits, so the sums run on exact
    * long "cents" — vectorized, codegen-friendly, ~5× faster than the
    * DECIMAL(18,2) path, and still bit-identical to the DuckDB oracle
    * (long→double conversion and the final division are the same IEEE
    * ops in both engines). `round` before the long cast because Spark
    * truncates double→long while DuckDB rounds.
    */
  val q1PricingSummary: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    val price = cents(col("l_extendedprice"))
    val discF = lit(100) - cents(col("l_discount"))      // (1-disc)*100
    val taxF  = lit(100) + cents(col("l_tax"))           // (1+tax)*100
    li.groupBy("l_returnflag", "l_linestatus").agg(
      (sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
      (sum(price) / lit(100.0)).as("sum_base_price"),
      (sum(price * discF) / lit(1e4)).as("sum_disc_price"),
      (sum(price * discF * taxF) / lit(1e6)).as("sum_charge"),
      count(lit(1)).as("count_order"))
  }

  val q1PricingSummarySql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty,
      CAST(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
      CAST(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus"""

  /** J1: inner equi-join + grouped revenue (shuffle join on orderkey;
    * AQE handles skew at scale).
    */
  val q2RevenueJoin: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o  = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-07-01"))
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          / lit(1e4)).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q2RevenueJoinSql: String = """
    SELECT o_orderpriority,
      CAST(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
      COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1995-07-01'
    GROUP BY o_orderpriority"""

  /** P1/P3/P5-style projection + filter — both predicates and the
    * 3-column ReadSchema reach the parquet scan (pushdown-verified in
    * PlanSpec).
    */
  val q3FilterProject: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_quantity") < 25)
      .select("l_orderkey", "l_extendedprice", "l_shipdate")

  val q3FilterProjectSql: String = """
    SELECT l_orderkey, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity < 25"""

  /** EP2 flagship — see [[graft.ops.DocAssembly]]. */
  val q4DocAssembly: Q = (s, dir) => DocAssembly.docs(s, dir)

  /** W2: rank-per-group window, deterministic via unique tie-break. */
  val q5TopkWindow: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  val q5TopkWindowSql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3"""

  /** A1: deterministic listagg(distinct) — sort_array pins the order
    * Redshift leaves unspecified (`Elastic_indexing.py:135,144`).
    */
  val q6ListaggDistinct: Q = (s, dir) =>
    t(s, dir, "orders").groupBy("o_custkey").agg(
      array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
        .as("priorities"),
      count(lit(1)).as("n_orders"))

  val q6ListaggDistinctSql: String = """
    SELECT o_custkey,
      array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
      COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey"""

  /** q43 — q5's top-3-per-customer computed by the CUSTOM bounded-k
    * `Aggregator` (§2.11(c), `ops/TopKAggregator`) instead of a window
    * sort, and held to the same DuckDB oracle: k items per group per
    * partition cross the wire — no per-group sort — and the buffer's
    * tie-breaking (score desc, id asc) must reproduce `row_number`'s
    * exactly for the hash gate to pass. Runs on the RELATIONAL udaf
    * path (ObjectHashAggregate with map-side partials), not
    * `groupByKey` — the typed route re-shuffles whole rows through the
    * encoder, the udaf ships only ≤k-element buffers.
    */
  val q43TopkAgg: Q = (s, dir) => {
    val topk = udaf(new graft.ops.TopKAggregator(3))
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"),
        (col("i") + 1).cast("int").as("rn"))
  }

  val q43TopkAggSql: String = """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3"""

  // =======================================================================
  // Registry
  // =======================================================================

  val queries: Map[String, Q] = Map(
    "q43_topk_agg"        -> q43TopkAgg,
    "q1_pricing_summary"  -> q1PricingSummary,
    "q2_revenue_join"     -> q2RevenueJoin,
    "q3_filter_project"   -> q3FilterProject,
    "q4_doc_assembly"     -> q4DocAssembly,
    "q5_topk_window"      -> q5TopkWindow,
    "q6_listagg_distinct" -> q6ListaggDistinct,
  ) ++ RefQueries.queries ++ graft.dedup.Dedup.queries ++
    graft.sim.Similarity.queries ++ graft.text.TextAnalysis.queries ++
    graft.text.Keywords.queries ++ graft.text.Bpe.queries ++
    graft.multimodal.Multimodal.queries ++
    graft.functions.KMV.queries ++ graft.corpus.Corpus.queries ++
    graft.search.SearchDsl.queries ++ graft.search.QueryIntents.queries ++
    graft.io.Scd2.queries ++
    graft.functions.CountMin.queries ++ graft.quality.Checks.queries ++
    graft.functions.HdrHist.queries ++
    Analytics.queries ++ Relational.queries ++ Tpch.queries ++
    Experiments.queries ++
    graft.graph.Graph.queries

  val oracleSql: Map[String, String] = Map(
    "q43_topk_agg"        -> q43TopkAggSql,
    "q1_pricing_summary"  -> q1PricingSummarySql,
    "q2_revenue_join"     -> q2RevenueJoinSql,
    "q3_filter_project"   -> q3FilterProjectSql,
    "q4_doc_assembly"     -> DocAssembly.docsOracle,
    "q5_topk_window"      -> q5TopkWindowSql,
    "q6_listagg_distinct" -> q6ListaggDistinctSql,
  ) ++ RefQueries.oracleSql ++ graft.dedup.Dedup.oracleSql ++
    graft.sim.Similarity.oracleSql ++ graft.text.TextAnalysis.oracleSql ++
    graft.text.Keywords.oracleSql ++ graft.text.Bpe.oracleSql ++
    graft.multimodal.Multimodal.oracleSql ++
    graft.functions.KMV.oracleSql ++ graft.corpus.Corpus.oracleSql ++
    graft.search.SearchDsl.oracleSql ++ graft.search.QueryIntents.oracleSql ++
    graft.io.Scd2.oracleSql ++
    graft.functions.CountMin.oracleSql ++ graft.quality.Checks.oracleSql ++
    graft.functions.HdrHist.oracleSql ++
    Analytics.oracleSql ++ Relational.oracleSql ++ Tpch.oracleSql ++
    Experiments.oracleSql ++
    graft.graph.Graph.oracleSql
}

package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Iterative graph analytics beyond d8's connected components: a
  * fixed-round PageRank over the customer→supplier purchase graph
  * (who funnels order volume to whom — the entity-importance score a
  * recommendation tier like the reference's T4/T5 indexes would rank
  * by).
  *
  * Determinism discipline: ranks live in integer MICROS and each
  * node's out-contribution is `rank_micro div outdeg` (integer floor
  * division) — so the per-round incoming sum is a sum of exact
  * integers, order-independent, and the DuckDB oracle (the same three
  * rounds as chained CTEs) matches bit-exactly. A float PageRank's
  * Σ(rank/outdeg) accumulates in whatever order the engine reduces —
  * the one thing a cross-engine hash gate cannot tolerate.
  *
  * Scale notes: the edge list is built once (distinct order-grain
  * pairs), persisted, and every round is one equi-join edge⋈rank on
  * src + one groupBy(dst) — both keyed so they co-partition; rounds
  * are FIXED (3), so unlike d8's convergence loop there is no
  * per-round driver action at all, and the whole computation is one
  * lazy plan. Rank state is O(|nodes|), never materialized to the
  * driver.
  */
object Graph {

  type Q = (SparkSession, String) => DataFrame

  /** Supplier node ids are offset so they can't collide with customer
    * keys in one rank table. */
  private val SuppOffset = 1000000000L
  private val Damping = 850000L // 0.85 in micros
  private val Base = 150000L    // 0.15 in micros
  private val Rounds = 3

  /** g1 — 3-round PageRank over customer→supplier order volume. */
  val g1Pagerank: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + SuppOffset).as("dst"))
      .distinct()
      .persist()
    // persisted: outdeg joins into every round and nodes anchors every
    // round's left join — unpersisted, the union-distinct (a shuffle)
    // and the degree aggregate replay once per unrolled round
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .persist()
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to Rounds) {
      val contrib = edges
        .join(ranks, col("src") === col("node"))
        .join(outdeg, "src")
        .select(col("dst"),
          (col("rank_micro") / col("outdeg")).cast("long").as("c"))
        .groupBy("dst").agg(sum("c").as("in_micro"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (lit(Base) + (lit(Damping) * coalesce(col("in_micro"), lit(0L))
            / lit(1000000L)).cast("long")).as("rank_micro"))
    }
    ranks.select(col("node"), col("rank_micro"),
      (col("node") >= SuppOffset).as("is_supplier"))
  }

  /** The same three rounds as chained CTEs. `//` is DuckDB's integer
    * floor division — the Spark side casts the fractional division to
    * long, identical for non-negative operands. */
  val g1PagerankSql: String = {
    def round(prev: String, out: String) =
      s"""$out AS (
        SELECT node,
               150000 + CAST(850000 * coalesce(i.in_micro, 0) // 1000000 AS BIGINT) AS rank_micro
        FROM nodes LEFT JOIN (
          SELECT dst, CAST(SUM(c) AS BIGINT) AS in_micro FROM (
            SELECT e.dst, r.rank_micro // o.outdeg AS c
            FROM edges e JOIN $prev r ON e.src = r.node
            JOIN outdeg o ON e.src = o.src) GROUP BY dst) i
          ON node = i.dst)"""
    s"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000000 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst FROM edges),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
    ${round("r0", "r1")},
    ${round("r1", "r2")},
    ${round("r2", "r3")}
    SELECT node, rank_micro, node >= 1000000000 AS is_supplier FROM r3"""
  }

  val queries: Map[String, Q] = Map("g1_pagerank" -> g1Pagerank)
  val oracleSql: Map[String, String] = Map("g1_pagerank" -> g1PagerankSql)
}

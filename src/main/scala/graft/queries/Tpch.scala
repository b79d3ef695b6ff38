package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The remaining classic TPC-H query shapes, adapted to the synthetic
  * star schema (no partsupp table; lineitem carries the part/supplier
  * keys directly). The reference's own SQL never goes past
  * join+listagg (SURVEY.md §2.4-§2.5) — these cover the warehouse
  * query surface a user would expect from a complete engine:
  * multi-dim disjunctive joins, conditional ratios, distinct-count
  * with exclusion sets, and semi-join chains.
  *
  * Exactness discipline (same as Registry/Relational): money and
  * quantity aggregate as long cents; ratios divide two exact longs
  * cast to double — the same IEEE op in both engines, so the hash
  * gate stays bit-exact even for "percentage" outputs.
  *
  * Scale notes per query are on each member; the common theme is
  * REDUCE BEFORE THE BIG SHUFFLE: nation/part predicates cut the
  * fact stream via broadcast joins before lineitem ever shuffles on
  * orderkey.
  */
object Tpch {

  type Q = (SparkSession, String) => DataFrame

  private def cents(c: Column) = round(c * 100).cast("long")
  private def revCents(pre: String = "l_") =
    round(col(pre + "extendedprice") * (lit(1) - col(pre + "discount")) * 100)
      .cast("long")

  // =========================================================================
  // q57 — two-nation trade volume (TPC-H Q7 shape)
  // =========================================================================

  /** Revenue shipped between NATION_1 suppliers and NATION_2 customers
    * (both directions) per year. Both nation filters are applied INSIDE
    * the broadcast dims — supplier and customer shrink to one nation
    * each before touching the fact tables, so the only wide shuffle is
    * lineitem⋈orders on orderkey; at 100 TB that join is the floor for
    * any order-grain query and everything else here is map-side.
    */
  val q57VolumeShipping: Q = (s, dir) => {
    val nat = Tables.load(s, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
    val sup = Tables.load(s, dir, "supplier")
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.load(s, dir, "customer")
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1998-01-01"))
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).as("l_year"))
      .agg(sum(revCents()).as("revenue_cents"))
  }

  val q57VolumeShippingSql: String = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1','NATION_2')
      AND n2.n_name IN ('NATION_1','NATION_2')
      AND n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)"""

  // =========================================================================
  // q58 — market share within a region (TPC-H Q8 shape)
  // =========================================================================

  /** NATION_2's share of revenue sold to ASIA-region customers per
    * year. Numerator and denominator come out of ONE aggregate
    * (conditional sum), so the share is a single long/long division —
    * no second pass, no float drift. The region membership is resolved
    * in the broadcast customer dim; supplier nation tags the fact rows
    * from a broadcast supplier dim.
    */
  val q58MarketShare: Q = (s, dir) => {
    val asiaNations = Tables.load(s, dir, "nation")
      .join(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val cust = Tables.load(s, dir, "customer")
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supNation = Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    Tables.load(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("l_shipdate")).as("l_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", revCents())
          .otherwise(lit(0L))).as("nation_rev_cents"),
        sum(revCents()).as("total_rev_cents"))
      .withColumn("mkt_share",
        col("nation_rev_cents").cast("double") /
        col("total_rev_cents").cast("double"))
  }

  val q58MarketShareSql: String = """
    SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_2'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS nation_rev_cents,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev_cents,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_2'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    GROUP BY year(l_shipdate)"""

  // =========================================================================
  // q59 — product-line profit by supplier nation (TPC-H Q9 shape)
  // =========================================================================

  /** Profit on widget-named parts per supplier nation per year, with
    * cost modeled as 10% of the part's retail price per unit (no
    * partsupp table in this schema). The part-name filter lands in the
    * broadcast part dim, cutting the fact stream map-side; profit
    * arithmetic is two rounded-cents terms, exact on both engines.
    */
  val q59ProductProfit: Q = (s, dir) => {
    val p = Tables.load(s, dir, "part")
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val supNation = Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.load(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(revCents() -
        round(col("l_quantity") * col("p_retailprice") * 10).cast("long"))
        .as("profit_cents"))
  }

  val q59ProductProfitSql: String = """
    SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                  - CAST(round(l_quantity * p_retailprice * 10) AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(l_shipdate)"""

  // =========================================================================
  // q60 — priority class counts (TPC-H Q12 shape)
  // =========================================================================

  /** High/low-priority lineitem counts per linestatus over a ship-date
    * window — the CASE-inside-SUM shape. One orderkey shuffle joins the
    * date-filtered fact to orders; both conditional counts come from
    * the same hash aggregate (one pass, map-side partials).
    */
  val q60PriorityClass: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01"))
      .select("l_orderkey", "l_linestatus")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
  }

  val q60PriorityClassSql: String = """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus"""

  // =========================================================================
  // q61 — promo revenue share per month (TPC-H Q14 shape)
  // =========================================================================

  /** PROMO-type parts' revenue share per 1996 month. Both the promo
    * and total revenue come from one conditional aggregate over the
    * broadcast-joined part dim; the share divides two exact longs.
    */
  val q61PromoShare: Q = (s, dir) => {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).as("l_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", revCents()).otherwise(lit(0L)))
          .as("promo_rev_cents"),
        sum(revCents()).as("total_rev_cents"))
      .withColumn("promo_share",
        col("promo_rev_cents").cast("double") /
        col("total_rev_cents").cast("double"))
  }

  val q61PromoShareSql: String = """
    SELECT CAST(month(l_shipdate) AS BIGINT) AS l_month,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS promo_rev_cents,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev_cents,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY month(l_shipdate)"""

  // =========================================================================
  // q62 — supplier variety with exclusion set (TPC-H Q16 shape)
  // =========================================================================

  /** Distinct suppliers per (brand, type, size-bucket), excluding
    * negative-balance suppliers (the "complaints" stand-in). The
    * exclusion is a broadcast anti join BEFORE the distinct-count
    * shuffle; the supplier-part association comes straight from
    * lineitem since this schema has no partsupp. count(DISTINCT)
    * plans as a two-stage partial-distinct aggregate — no single
    * reducer sees the full pair set.
    */
  val q62SupplierVariety: Q = (s, dir) => {
    val excluded = Tables.load(s, dir, "supplier")
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    val p = Tables.load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1")
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        (floor(col("p_size") / 10) * 10).cast("int").as("size_bucket"))
    Tables.load(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "size_bucket")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q62SupplierVarietySql: String = """
    SELECT p_brand, p_type,
           CAST(CAST(floor(p_size / 10) AS INTEGER) * 10 AS INTEGER) AS size_bucket,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, size_bucket"""

  // =========================================================================
  // q63 — disjunctive multi-clause join predicate (TPC-H Q19 shape)
  // =========================================================================

  /** Revenue per brand under three OR'd (brand, size-range, qty-range)
    * clauses spanning both join sides. The common join key stays an
    * equi-join on partkey (broadcast); only the residual disjunction is
    * evaluated post-join — Catalyst also extracts the common
    * brand-IN and qty-range conjuncts and pushes them into the
    * respective scans, which is the shape that matters at 100 TB.
    */
  val q63DisjunctiveJoin: Q = (s, dir) => {
    val p = Tables.load(s, dir, "part")
      .select("p_partkey", "p_brand", "p_size")
    Tables.load(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 30)))
      .groupBy("p_brand")
      .agg(sum(revCents()).as("revenue_cents"), count(lit(1)).as("n_items"))
  }

  val q63DisjunctiveJoinSql: String = """
    SELECT p_brand,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
    GROUP BY p_brand"""

  // =========================================================================
  // q64 — qualified-supplier semi-join chain (TPC-H Q20 shape)
  // =========================================================================

  /** Suppliers who shipped more than 55 units of any red-named part
    * in 1996. Three-stage reduction: part-name filter (broadcast) →
    * per-(supplier, part) quantity aggregate with HAVING — one shuffle
    * whose key set is already part-filtered — → distinct suppkeys
    * semi-join the supplier dim. Nothing order-grain survives past the
    * first aggregate.
    */
  val q64QualifiedSuppliers: Q = (s, dir) => {
    val redParts = Tables.load(s, dir, "part")
      .filter(col("p_name").startsWith("red")).select("p_partkey")
    val qualified = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(cents(col("l_quantity"))).as("qty_cents"))
      .filter(col("qty_cents") > 55 * 100L)
      .select("l_suppkey").distinct()
    Tables.load(s, dir, "supplier")
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
  }

  val q64QualifiedSuppliersSql: String = """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) > 5500)"""

  // =========================================================================
  // q67 — returned-item revenue ranking (TPC-H Q10 shape)
  // =========================================================================

  /** Top-20 customers by revenue on returned items (returnflag R) in a
    * quarter. Aggregate-then-enrich, like q55: the returnflag+date
    * filters push into the lineitem scan, the orderkey join shuffles
    * only the filtered fact, and the customer/nation enrichment joins
    * run AFTER the per-customer aggregate — on |qualifying customers|
    * rows, not order-grain data. The global top-20 plans as
    * TakeOrderedAndProject (per-partition heads merged on the driver),
    * never a full sort; ties break on custkey for the hash gate.
    */
  val q67ReturnedRevenue: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-07-01"))
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val perCust = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(revCents()).as("rev_cents"), count(lit(1)).as("n_items"))
    val c = Tables.load(s, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    perCust
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("rev_cents").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "n_name", "rev_cents", "n_items")
  }

  val q67ReturnedRevenueSql: String = """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY rev_cents DESC, c_custkey LIMIT 20"""

  // =========================================================================
  // q73 — market-basket lift (co-purchase association)
  // =========================================================================

  /** Brand pairs bought together in one order beyond what independent
    * popularity predicts: `lift = N·c(ab)/(c(a)·c(b))` in integer
    * micros — the association-rule core, k5's PMI shape at order
    * grain. Baskets are distinct brands per order (broadcast part
    * dim), so the quadratic dimension is |brands| (~25), never
    * order-grain data; the pair explode is per-order over a ≤25-element
    * array and shuffles on the pair key. Support floor drops noise
    * pairs before the count joins.
    *
    * Deliberately NOT cached: the three consumers (pair counts,
    * per-brand counts, basket count) share the orderkey exchange via
    * ReuseExchange, and re-running the post-shuffle set-agg is cheaper
    * than a disk-backed cache write of the array column (measured
    * 1.78s vs 2.08s cold at sf0.1; r5's 0.90s was warm-cache reuse
    * across bench passes, not a real plan cost). Dict-encoding brands
    * to ints and a single-pass tagged-union emit were both measured
    * and are NOT faster — the cost floor here is stage count, not
    * per-row compute.
    */
  val q73BasketLift: Q = (s, dir) => {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand")
    val baskets = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
    val present = baskets.select(col("l_orderkey"), explode(col("bs")).as("b"))
    val cb = present.groupBy("b").agg(count(lit(1)).as("c1"))
    val n = baskets.agg(count(lit(1)).as("n_orders"))
    baskets
      .select(explode(expr(
        """flatten(transform(bs, (a, i) ->
             transform(slice(bs, i + 2, size(bs)), x ->
               struct(a AS ba, x AS bb))))""")).as("p"))
      .groupBy(col("p.ba").as("ba"), col("p.bb").as("bb"))
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 20)
      .join(cb.select(col("b").as("ba"), col("c1").as("ca")), "ba")
      .join(cb.select(col("b").as("bb"), col("c1").as("cb")), "bb")
      .crossJoin(broadcast(n))
      .select(col("ba"), col("bb"), col("cab"), col("ca"), col("cb"),
        expr("cast(round(1e6 * cast(n_orders as double) * cab / (cast(ca as double) * cb)) as bigint)")
          .as("lift_micro"))
  }

  val q73BasketLiftSql: String = """
    WITH baskets AS (
      SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS bs
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1),
    present AS (SELECT l_orderkey, unnest(bs) AS b FROM baskets),
    cb AS (SELECT b, count(*) AS c1 FROM present GROUP BY 1),
    n AS (SELECT count(*) AS n_orders FROM baskets),
    pairs AS (
      SELECT a.b AS ba, x.b AS bb, count(*) AS cab
      FROM present a JOIN present x
        ON a.l_orderkey = x.l_orderkey AND a.b < x.b
      GROUP BY 1, 2 HAVING count(*) >= 20)
    SELECT ba, bb, cab, ca.c1 AS ca, cb2.c1 AS cb,
           CAST(round(1e6 * CAST(n_orders AS DOUBLE) * cab
                / (CAST(ca.c1 AS DOUBLE) * cb2.c1)) AS BIGINT) AS lift_micro
    FROM pairs
    JOIN cb ca ON ba = ca.b
    JOIN cb cb2 ON bb = cb2.b
    CROSS JOIN n"""

  val queries: Map[String, Q] = Map(
    "q73_basket_lift"        -> q73BasketLift,
    "q67_returned_revenue"   -> q67ReturnedRevenue,
    "q57_volume_shipping"    -> q57VolumeShipping,
    "q58_market_share"       -> q58MarketShare,
    "q59_product_profit"     -> q59ProductProfit,
    "q60_priority_class"     -> q60PriorityClass,
    "q61_promo_share"        -> q61PromoShare,
    "q62_supplier_variety"   -> q62SupplierVariety,
    "q63_disjunctive_join"   -> q63DisjunctiveJoin,
    "q64_qualified_suppliers" -> q64QualifiedSuppliers,
  )

  val oracleSql: Map[String, String] = Map(
    "q73_basket_lift"        -> q73BasketLiftSql,
    "q67_returned_revenue"   -> q67ReturnedRevenueSql,
    "q57_volume_shipping"    -> q57VolumeShippingSql,
    "q58_market_share"       -> q58MarketShareSql,
    "q59_product_profit"     -> q59ProductProfitSql,
    "q60_priority_class"     -> q60PriorityClassSql,
    "q61_promo_share"        -> q61PromoShareSql,
    "q62_supplier_variety"   -> q62SupplierVarietySql,
    "q63_disjunctive_join"   -> q63DisjunctiveJoinSql,
    "q64_qualified_suppliers" -> q64QualifiedSuppliersSql,
  )
}

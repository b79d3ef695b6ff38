package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** EP2 — the reference's document-index build
  * (`Talent_Opportunity_Platform/Elastic_indexing.py:106-328`): a fact
  * table nvl-projected (P1), LEFT-JOINed to three derived subqueries
  * (J2), one of which is a GROUP BY + listagg(distinct) UNION ALL pair
  * (A1/U1), then merged per document key into scalars + split-arrays +
  * an 8-dim feature vector (A5).
  *
  * The reference does the final merge driver-side in a Python dict
  * (`Elastic_indexing.py:226-328`); here it is a distributed
  * `groupBy(dre_cd).agg(...)` — same result, no collect, and Catalyst
  * gets partial aggregation + AQE for free. At 100 TB the fact/trng
  * join shuffles on the customer key while `nation` is broadcast; the
  * final aggregate is near-free because `dre_cd` is a superset key of
  * the join key (one extra hash agg, no extra wide shuffle of note).
  *
  * Remapped onto TESTDATA per FIXTURES.md §3: orders = fact,
  * orders(Y/N branches) = training history, customer = ruleout dim,
  * customer⋈nation = info dim.
  */
object DocAssembly {

  /** Per-row feature scores f01..f08 (reference: f01_score..f08_score,
    * `Elastic_indexing.py:119-126`). Pure per-row double arithmetic —
    * deterministic and oracle-reproducible.
    */
  private def factSide(orders: DataFrame): DataFrame =
    orders.select(
      concat(col("o_custkey"), lit("-"), col("o_orderkey")).as("dre_cd"),
      col("o_custkey").as("emp_no"),
      col("o_orderpriority").as("dre_dty_cd"),
      (col("o_totalprice") * lit(0.1)).as("f01"),
      (col("o_totalprice") * lit(0.01) + lit(1.0)).as("f02"),
      (col("o_orderkey") % 7).cast("double").as("f03"),
      (col("o_custkey") % 5).cast("double").as("f04"),
      length(col("o_orderpriority")).cast("double").as("f05"),
      dayofmonth(col("o_orderdate")).cast("double").as("f06"),
      month(col("o_orderdate")).cast("double").as("f07"),
      year(col("o_orderdate")).cast("double").as("f08"))

  /** The A1/U1 subquery: per-customer distinct priority list, split by
    * the Y/N flag into two branches unioned with complementary nulls
    * (`Elastic_indexing.py:133-147`). `sort_array` pins the order that
    * Redshift `listagg(distinct)` leaves unspecified (SURVEY §7).
    */
  private def trngSide(orders: DataFrame): DataFrame =
    // One aggregation pass instead of two filtered groupBys + union:
    // collect both branch sets conditionally (collect_set drops the
    // CASE's nulls), and keep BOTH branch lists in ONE row per
    // customer instead of re-creating the reference's two-row union
    // shape. The union shape only existed so a downstream
    // max()-per-document could pick each branch back out; emitting
    // (y_list, n_list) directly makes that downstream merge a 1:1
    // join — same values, one less order-grain shuffle (see [[docs]]).
    orders.groupBy(col("o_custkey").as("trng_emp_no"))
      .agg(
        sort_array(collect_set(when(col("o_orderstatus") === "F",
          col("o_orderpriority")))).as("y_set"),
        sort_array(collect_set(when(col("o_orderstatus") =!= "F",
          col("o_orderpriority")))).as("n_set"))
      .select(col("trng_emp_no"),
        when(size(col("y_set")) > 0, array_join(col("y_set"), ","))
          .as("y_list"),
        when(size(col("n_set")) > 0, array_join(col("n_set"), ","))
          .as("n_list"))

  /** Scalar + list document columns, grouped per `dre_cd`. Oracle-safe:
    * doubles are per-row arithmetic carried through `max`, lists are
    * canonically sorted strings.
    */
  def docs(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val nation   = Tables.load(spark, dir, "nation")

    // ruleout + info fused into ONE customer-grain dim: both of the
    // reference's subqueries key on the same unique customer key, so
    // two left joins == one left join against their 1:1 merge — one
    // customer scan and one join instead of two of each. nation is a
    // left join here where the reference's info subquery was inner,
    // but the only surviving column is info_nation, which coalesces
    // to '' either way — identical output, and no customer row can
    // vanish from the dim.
    val custDim = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey").as("cd_emp_no"),
        when(col("c_mktsegment") === "BUILDING", "Y").otherwise("N").as("ruleout_yn"),
        col("n_name").as("info_nation"))

    // Every join side is exactly one row per customer key, and dre_cd
    // is unique per fact row — so the reference's final
    // groupBy(document).agg(max(...)) merge (`Elastic_indexing.py:
    // 226-328`, driver-side dict) is the identity here and is elided
    // entirely. That removes the widest shuffle in the old plan: a
    // re-hash of the full order-grain join result on dre_cd (a key
    // Catalyst can't know is a superset of the join key). Remaining
    // wide work: ONE order-grain shuffle onto the customer key for
    // the join, plus the customer-grain trng aggregation that partial
    // (map-side) aggregation shrinks before it ships.
    val fact = factSide(orders)
    fact
      .join(trngSide(orders), fact("emp_no") === col("trng_emp_no"), "left")
      .join(custDim, fact("emp_no") === col("cd_emp_no"), "left")
      .select(
        col("dre_cd"),
        col("emp_no").as("dre_emp_no"),
        col("dre_dty_cd"),
        coalesce(col("ruleout_yn"), lit("")).as("ruleout_yn"),
        coalesce(col("info_nation"), lit("")).as("info_nation"),
        coalesce(col("y_list"), lit("")).as("trng_y_list"),
        coalesce(col("n_list"), lit("")).as("trng_n_list"),
        col("f01"), col("f02"), col("f03"), col("f04"),
        col("f05"), col("f06"), col("f07"), col("f08"))
  }

  /** Full document shape with real array/vector columns — the ES doc
    * model (`Elastic_indexing.py:229-258`): comma-split arrays plus the
    * dim-8 `feature_vector` with 0.0 fill (`:257,274-313`).
    */
  def documents(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("dre_cd"), col("dre_emp_no"), col("dre_dty_cd"),
      col("ruleout_yn"), col("info_nation"),
      when(col("trng_y_list") === "", array().cast("array<string>"))
        .otherwise(split(col("trng_y_list"), ",")).as("array_trng_y_dvsn_cd"),
      when(col("trng_n_list") === "", array().cast("array<string>"))
        .otherwise(split(col("trng_n_list"), ",")).as("array_trng_n_dvsn_cd"),
      array((1 to 8).map(i => coalesce(col(f"f$i%02d"), lit(0.0))): _*)
        .as("feature_vector"))

  /** DuckDB oracle for [[docs]] — same computation in ANSI SQL. */
  val docsOracle: String = """
    WITH fact AS (
      SELECT o_custkey || '-' || o_orderkey AS dre_cd,
             o_custkey AS emp_no,
             o_orderpriority AS dre_dty_cd,
             o_totalprice * CAST(0.1 AS DOUBLE) AS f01,
             o_totalprice * CAST(0.01 AS DOUBLE) + CAST(1.0 AS DOUBLE) AS f02,
             CAST(o_orderkey % 7 AS DOUBLE) AS f03,
             CAST(o_custkey % 5 AS DOUBLE) AS f04,
             CAST(length(o_orderpriority) AS DOUBLE) AS f05,
             CAST(EXTRACT(day FROM o_orderdate) AS DOUBLE) AS f06,
             CAST(EXTRACT(month FROM o_orderdate) AS DOUBLE) AS f07,
             CAST(EXTRACT(year FROM o_orderdate) AS DOUBLE) AS f08
      FROM orders),
    trng AS (
      SELECT o_custkey AS trng_emp_no,
             array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS y_list,
             NULL AS n_list
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
      UNION ALL
      SELECT o_custkey, NULL,
             array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
      FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_custkey),
    ruleout AS (
      SELECT c_custkey AS r_emp_no,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 'Y' ELSE 'N' END AS ruleout_yn
      FROM customer),
    info AS (
      SELECT c_custkey AS i_emp_no, n_name AS info_nation
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    SELECT dre_cd,
           max(emp_no) AS dre_emp_no,
           max(dre_dty_cd) AS dre_dty_cd,
           coalesce(max(ruleout_yn), '') AS ruleout_yn,
           coalesce(max(info_nation), '') AS info_nation,
           coalesce(max(y_list), '') AS trng_y_list,
           coalesce(max(n_list), '') AS trng_n_list,
           max(f01) AS f01, max(f02) AS f02, max(f03) AS f03,
           max(f04) AS f04, max(f05) AS f05, max(f06) AS f06,
           max(f07) AS f07, max(f08) AS f08
    FROM fact
    LEFT JOIN trng    ON fact.emp_no = trng.trng_emp_no
    LEFT JOIN ruleout ON fact.emp_no = ruleout.r_emp_no
    LEFT JOIN info    ON fact.emp_no = info.i_emp_no
    GROUP BY dre_cd"""
}

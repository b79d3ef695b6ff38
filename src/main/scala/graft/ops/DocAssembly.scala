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
  private def trngSide(orders: DataFrame): DataFrame = {
    // One aggregation pass instead of two filtered groupBys + union:
    // collect both branch sets conditionally (collect_set drops the
    // CASE's nulls), then explode into the reference's two-row-per-key
    // union shape, keeping rows only for branches that had input — the
    // exact row set the filtered branches produced, at half the
    // shuffles and one orders scan.
    orders.groupBy(col("o_custkey").as("trng_emp_no"))
      .agg(
        sort_array(collect_set(when(col("o_orderstatus") === "F",
          col("o_orderpriority")))).as("y_set"),
        sort_array(collect_set(when(col("o_orderstatus") =!= "F",
          col("o_orderpriority")))).as("n_set"))
      .select(col("trng_emp_no"), explode(expr(
        """filter(array(
             named_struct('y_list', array_join(y_set, ','),
                          'n_list', CAST(NULL AS STRING),
                          'nonempty', size(y_set) > 0),
             named_struct('y_list', CAST(NULL AS STRING),
                          'n_list', array_join(n_set, ','),
                          'nonempty', size(n_set) > 0)),
           b -> b.nonempty)""")).as("b"))
      .select(col("trng_emp_no"), col("b.y_list"), col("b.n_list"))
  }

  /** Scalar + list document columns, grouped per `dre_cd`. Oracle-safe:
    * doubles are per-row arithmetic carried through `max`, lists are
    * canonically sorted strings.
    */
  def docs(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val nation   = Tables.load(spark, dir, "nation")

    val ruleout = customer.select(
      col("c_custkey").as("r_emp_no"),
      when(col("c_mktsegment") === "BUILDING", "Y").otherwise("N").as("ruleout_yn"))
    val info = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("i_emp_no"), col("n_name").as("info_nation"))

    val fact = factSide(orders)
    val joined = fact
      .join(trngSide(orders), fact("emp_no") === col("trng_emp_no"), "left")
      .join(ruleout, fact("emp_no") === col("r_emp_no"), "left")
      .join(info, fact("emp_no") === col("i_emp_no"), "left")

    joined.groupBy("dre_cd").agg(
      max("emp_no").as("dre_emp_no"),
      max("dre_dty_cd").as("dre_dty_cd"),
      coalesce(max("ruleout_yn"), lit("")).as("ruleout_yn"),
      coalesce(max("info_nation"), lit("")).as("info_nation"),
      coalesce(max("y_list"), lit("")).as("trng_y_list"),
      coalesce(max("n_list"), lit("")).as("trng_n_list"),
      max("f01").as("f01"), max("f02").as("f02"), max("f03").as("f03"),
      max("f04").as("f04"), max("f05").as("f05"), max("f06").as("f06"),
      max("f07").as("f07"), max("f08").as("f08"))
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

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class AnalyticsSpec extends SparkSpec {

  test("q85's closed-form ancestor explode matches the recursive CTE row-for-row") {
    // r14 replaced the UnionLoop recursion (one sequential job per
    // level) with the halving chain's closed form; this pins the
    // equivalence against REAL recursion semantics in-engine (the
    // DuckDB oracle re-proves it cross-engine on every driver run)
    val got = graft.queries.Registry.queries("q85_hierarchy_rollup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sq = spark.newSession()
    sq.conf.set("spark.sql.cteRecursionLevelLimit", "200")
    Tables.load(sq, sfDir, "documents")
      .selectExpr("doc_id",
        "size(split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')) AS n_tokens")
      .createOrReplaceTempView("q85_ref_docs")
    val ref = sq.sql("""
      WITH RECURSIVE anc AS (
        SELECT doc_id, doc_id AS ancestor, n_tokens FROM q85_ref_docs
        UNION ALL
        SELECT doc_id, ancestor DIV 2 AS ancestor, n_tokens
        FROM anc WHERE ancestor > 0)
      SELECT ancestor AS category, count(*) AS n_desc_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS subtree_tokens
      FROM anc GROUP BY ancestor""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
  }

  test("q34 cube emits all four grouping sets; grand total matches table count") {
    val out = Analytics.q34Cube(spark, sfDir).cache()
    assert(out.select("gid").distinct().collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    val grand = out.filter(col("gid") === 3).collect()
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("n") == Tables.load(spark, sfDir, "lineitem").count())
    out.unpersist()
  }

  test("q35 unpivot yields 4 rows per input row and conserves sums") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val out = Analytics.q35Unpivot(spark, sfDir).cache()
    assert(out.count() == 4 * li.count())
    val qty = out.filter(col("metric") === "l_quantity")
      .agg(sum("value")).collect()(0).getDouble(0)
    val expected = li.agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(math.abs(qty - expected) < 1e-6)
    out.unpersist()
  }

  test("q36 fuzzy pairs stay within the distance bound and the brand block") {
    val out = Analytics.q36FuzzyPairs(spark, sfDir).cache()
    assert(out.filter(col("dist") > 4 || col("part_a") >= col("part_b")).isEmpty)
    assert(out.count() > 0)
    out.unpersist()
  }

  test("q36 candidate generator is length-banded: complete for the threshold, bounded below vocab²") {
    val s = spark
    import s.implicits._
    // synthetic large vocab with a spread length histogram: 60 lengths
    // × 20 names each = 1200 names, 1.44M unblocked ordered pairs
    val names = (0 until 1200)
      .map(i => "x" * (5 + i % 60) + f"-${i}%04d").toDF("p_name")
    val cand = Analytics.q36NamePairs(names).cache()
    val n = cand.count()
    // completeness: exactly the ordered pairs with |Δlen| <= 4 —
    // nothing eligible for distance ≤ 4 is lost, nothing else kept
    val withLen = names.select(col("p_name"), length(col("p_name")).as("l"))
    val eligible = withLen.as("a").join(withLen.as("b"),
      abs(col("a.l") - col("b.l")) <= 4).count()
    assert(n == eligible)
    // boundedness: ≤ vocab × (names in 3 adjacent 5-wide bands),
    // far below the 1200² unblocked cross
    val vocab = 1200L
    val maxBand3 = 3 * 5 * 20L // 3 bands × 5 lengths × 20 names/length
    assert(n <= vocab * maxBand3)
    assert(n < vocab * vocab / 4)
    cand.unpersist()
  }

  test("q37 gap fill conserves event counts and actually fills gaps") {
    val out = Analytics.q37GapFill(spark, sfDir).cache()
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sfDir, "events").count())
    // spine is dense: every type has the same number of hours
    val perType = out.groupBy("event_type").count()
      .select("count").distinct().collect()
    assert(perType.length == 1)
    assert(out.filter(col("n") === 0).count() > 0, "expected zero-filled hours")
    out.unpersist()
  }

  test("q41 funnel counts are monotone: converted <= attributed <= clicks") {
    val out = Analytics.q41Funnel(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_converted") > col("n_attributed") ||
      col("n_attributed") > col("n_clicks")).isEmpty)
    // sf0.001 carries exactly one attributed click and no conversions;
    // the conversion stage is exercised by the sf0.01 oracle gate
    assert(out.filter(col("n_attributed") > 0).count() > 0)
    out.unpersist(): Unit
  }

  test("q42 cohort matrix is upper-triangular and week-0 covers every cohort user") {
    val out = Analytics.q42CohortRetention(spark, sfDir).cache()
    assert(out.filter(col("week") < col("cohort_week")).isEmpty)
    assert(out.filter(col("weeks_since") =!= col("week") - col("cohort_week")).isEmpty)
    // week 0 of each cohort has the cohort's full user count
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val users = ev.select("user_id").distinct().count()
    val week0 = out.filter(col("weeks_since") === 0)
      .agg(sum("n_active")).collect()(0).getLong(0)
    assert(week0 == users, s"week-0 sum $week0 != $users distinct users")
    out.unpersist(): Unit
  }

  test("q38 distribution windows are bounded and quartiles partition each customer") {
    val out = Analytics.q38DistWindows(spark, sfDir).cache()
    assert(out.filter(col("pr") < 0 || col("pr") > 1 ||
      col("cd") <= 0 || col("cd") > 1 ||
      col("quartile") < 1 || col("quartile") > 4).isEmpty)
    out.unpersist()
  }
}

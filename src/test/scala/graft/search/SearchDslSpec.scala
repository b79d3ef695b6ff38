package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchDslSpec extends SparkSpec {

  private def events = graft.core.Tables.load(spark, sfDir, "events")
  private def docs = graft.core.Tables.load(spark, sfDir, "documents")

  test("bool/term/range/exists spec matches the hand-written filter") {
    val dsl = events.filter(SearchDsl.compile(SearchDsl.q27Spec))
    val hand = events.filter(
      col("event_type").isin("click", "purchase") &&
      col("value") >= 5.0 && col("value") < 50.0 &&
      col("user_id").isNotNull &&
      !col("user_id").isin(7L, 13L, 42L))
    assert(dsl.count() == hand.count() && dsl.count() > 0)
    assert(dsl.exceptAll(hand).isEmpty)
  }

  test("query_string searches any of the listed fields") {
    val q = """{"query_string": {"query": "src1", "fields": ["source", "lang"]}}"""
    val dsl = docs.filter(SearchDsl.compile(q))
    val hand = docs.filter(
      col("source").contains("src1") || col("lang").contains("src1"))
    assert(dsl.count() == hand.count() && dsl.count() > 0)
  }

  test("should-clause compiles to OR, match to contains") {
    val q = """{"bool": {"should": [
      {"match": {"lang": "en"}}, {"term": {"source": "src3"}}]}}"""
    val n = docs.filter(SearchDsl.compile(q)).count()
    val hand = docs.filter(
      col("lang").contains("en") || col("source") === "src3").count()
    assert(n == hand && n > 0)
  }

  test("DSL conjuncts reach the parquet scan as pushed filters") {
    val plan = events.filter(SearchDsl.compile(SearchDsl.q27Spec))
      .select("event_id").queryExecution.executedPlan.toString
    // equality-IN and range conjuncts are pushable; contains is not
    assert(plan.contains("PushedFilters") &&
      plan.contains("In(event_type") &&
      plan.contains("GreaterThanOrEqual(value"))
  }

  test("unsupported ops and empty bools are rejected at compile time") {
    intercept[IllegalArgumentException] {
      SearchDsl.compile("""{"fuzzy": {"lang": "en"}}""")
    }
    intercept[IllegalArgumentException] {
      SearchDsl.compile("""{"bool": {}}""")
    }
  }
}

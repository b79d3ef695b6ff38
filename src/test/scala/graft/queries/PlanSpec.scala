package graft.queries

import graft.SparkSpec

/** Plan-shape assertions — the 100 TB safeguards. A query that stops
  * pushing filters into the scan or stops broadcasting its dims would
  * still pass the value oracle; these tests pin the physical plan
  * properties that matter at scale.
  */
class PlanSpec extends SparkSpec {

  private def physicalPlan(name: String): String = {
    val df = Registry.queries(name)(spark, sfDir)
    // collect() (not count(), which plans a different query) so AQE
    // finalizes THIS plan and codegen ids appear
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q3 pushes filters and prunes columns at the parquet scan") {
    val plan = physicalPlan("q3_filter_project")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
    // 3-column projection must reach ReadSchema, not scan all 11 columns
    assert(!plan.contains("l_comment"), plan)
  }

  test("q4 doc assembly broadcasts the small dimension side") {
    val plan = physicalPlan("q4_doc_assembly")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q1 aggregation runs inside whole-stage codegen") {
    val plan = physicalPlan("q1_pricing_summary")
    // "*(n)" is the WholeStageCodegen stage marker in simpleString
    assert(plan.contains("*(1)"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q8 semi join stays a semi join in the physical plan") {
    val plan = physicalPlan("q8_semi_join")
    assert(plan.contains("LeftSemi"), plan)
  }
}

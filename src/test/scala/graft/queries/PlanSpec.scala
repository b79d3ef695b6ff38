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

  test("q55 aggregates lineitem BEFORE joining orders (no order-grain join)") {
    val plan = physicalPlan("q55_big_orders")
    // plans print root-first: in the aggregate-then-join shape the join
    // is the ROOT side and its HAVING-filtered aggregate child prints
    // below it; a join-then-aggregate plan would print the final
    // aggregate first
    val firstAgg = plan.indexOf("HashAggregate")
    val firstJoin = math.min(
      wrap(plan.indexOf("BroadcastHashJoin")),
      wrap(plan.indexOf("SortMergeJoin")))
    assert(firstAgg >= 0 && firstJoin < firstAgg,
      s"aggregate planned above the join:\n$plan")
  }

  test("q62 exclusion set plans as a broadcast ANTI join") {
    val plan = physicalPlan("q62_supplier_variety")
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q67 global top-20 plans as TakeOrderedAndProject, not a full sort") {
    val plan = physicalPlan("q67_returned_revenue")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  private def wrap(i: Int): Int = if (i < 0) Int.MaxValue else i
}

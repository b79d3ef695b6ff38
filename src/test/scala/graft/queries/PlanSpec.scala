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

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // At 100 TB the win is reading LESS: when one join side is
    // selectively filtered, Spark can inject a bloom filter of its
    // join keys into the other side's scan so non-matching rows die
    // at the source instead of crossing the shuffle. Thresholds are
    // scaled down to fixture size; the rule under test
    // (InjectRuntimeFilter) is the one production runs.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.core.Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val o = graft.core.Tables.load(spark, sfDir, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = li.join(o,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter on the probe side:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("q72 RFM quintiles run with NO partition-less window (r4 verdict #1)") {
    val df = Registry.queries("q72_rfm")(spark, sfDir)
    df.collect()
    assert(graft.tools.PlanCheck.partitionlessWindows(df).isEmpty,
      df.queryExecution.executedPlan.toString)
  }

  test("q80 deciles: only the 10-row cumsum window is partition-less") {
    // DistributedRank handles the customer-grain decile; the one
    // remaining partition-less window is the cumulative sum over the
    // 10 aggregated decile rows (bounded by bucket count). A second
    // offender would mean the corpus-grain ntile crept back.
    val df = Registry.queries("q80_decile_lift")(spark, sfDir)
    df.collect()
    val offenders = graft.tools.PlanCheck.partitionlessWindows(df)
    assert(offenders.size <= 1, offenders.mkString("; "))
  }

  test("q67 global top-20 plans as TakeOrderedAndProject, not a full sort") {
    val plan = physicalPlan("q67_returned_revenue")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q84 multi-distinct stats compile to ONE Expand scan, not N scans") {
    val plan = physicalPlan("q84_table_stats")
    // Expand is the multi-distinct rewrite; a second parquet scan of
    // orders would mean Catalyst fell back to per-column passes.
    // (AQE's toString repeats the tree under "== Initial Plan ==" —
    // count scans in the final section only.)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("Expand"), plan)
    assert(finalPlan.split("Scan parquet").length - 1 === 1, plan)
  }

  test("k7 top-5 pick is the bounded aggregator, not a vocab window sort") {
    val plan = physicalPlan("k7_chi2_keywords")
    assert(plan.contains("ObjectHashAggregate"), plan)
    // the (source x vocab) stream must not flow through a Window
    assert(!plan.contains("Window"), plan)
  }

  test("q83 percentile plan carries NO per-group value buffers") {
    val plan = physicalPlan("q83_sla_percentiles")
    // the buffering percentile() aggregate would appear as
    // ObjectHashAggregate(percentile...); the histogram method needs
    // only hash aggregates + a bounded window
    assert(!plan.contains("percentile"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  private def wrap(i: Int): Int = if (i < 0) Int.MaxValue else i
}

package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class FormatsSpec extends SparkSpec {

  test("ORC round-trip preserves rows and pushes filters into the scan") {
    val orders = Tables.load(spark, sfDir, "orders")
    val path = tmpDir("orc") + "/orders"
    Formats.writeOrc(orders, path)
    val back = Formats.readOrc(spark, path)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
    // multiset equality both directions
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    val filtered = back.filter(col("o_custkey") === 7).select("o_orderkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)"),
      s"ORC scan did not push the filter:\n$plan")
  }

  test("text round-trip: one line per document") {
    val docs = Tables.load(spark, sfDir, "documents").select(
      // newlines would break line-oriented storage: strip defensively
      regexp_replace(col("text"), "[\\r\\n]", " ").as("line"))
    val path = tmpDir("txt") + "/corpus"
    Formats.writeText(docs, "line", path)
    val back = Formats.readText(spark, path)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs.withColumnRenamed("line", "value")).isEmpty)
  }
}

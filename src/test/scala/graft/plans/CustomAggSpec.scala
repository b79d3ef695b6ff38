package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TopKAggregator

class CustomAggSpec extends SparkSpec {

  test("ListAgg matches the built-in sort_array∘collect_set composition") {
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
    val native = orders.groupBy("o_custkey")
      .agg(ListAgg.listagg(col("o_orderpriority")).as("p"))
    val builtin = orders.groupBy("o_custkey")
      .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("p"))
    assert(native.exceptAll(builtin).isEmpty && builtin.exceptAll(native).isEmpty)
  }

  test("listagg is callable from SQL text via GraftExtensions") {
    // Sessions.local wires the extension; the shared test session may
    // predate it, so register into its FunctionRegistry the same way
    val s = spark
    s.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("listagg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ListAgg].getName, "listagg"),
      ListAgg.builder _)
    graft.core.Tables.load(s, sfDir, "orders").createOrReplaceTempView("orders")
    val df = s.sql(
      "SELECT o_custkey, listagg(o_orderpriority, '|') AS p FROM orders GROUP BY 1")
    val one = df.filter(col("o_custkey") === 1).collect()
    if (one.nonEmpty) assert(one(0).getString(1).split('|').toSeq.sorted ==
      one(0).getString(1).split('|').toSeq)
    assert(df.count() > 0)
  }

  test("TopKAggregator agrees with the window-function top-k") {
    val s = spark
    import s.implicits._
    val orders = graft.core.Tables.load(s, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
    val viaAgg = orders.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "o_orderkey")))
      .select(col("o_custkey"), (col("i") + 1).as("rn"), col("o_orderkey"))
    val viaWindow = graft.queries.Registry.queries("q5_topk_window")(s, sfDir)
      .select(col("o_custkey"), col("rn").cast("int").as("rn"), col("o_orderkey"))
    // q5 orders by (price desc, orderkey asc); TopK ties break the same
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("TopKAggregator via functions.udaf matches the typed path and " +
       "plans an ObjectHashAggregate") {
    val s = spark
    val topk = udaf(new TopKAggregator(3))
    val viaUdaf = graft.core.Tables.load(s, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "o_orderkey")))
      .select(col("o_custkey"), (col("i") + 1).cast("int").as("rn"), col("o_orderkey"))
    val viaWindow = graft.queries.Registry.queries("q5_topk_window")(s, sfDir)
      .select(col("o_custkey"), col("rn").cast("int").as("rn"), col("o_orderkey"))
    assert(viaUdaf.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaUdaf).isEmpty)
    // relational path: the custom buffer aggregates with map-side
    // partials (partial_topkaggregator under an ObjectHashAggregate)
    val plan = graft.core.Tables.load(s, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topkaggregator"))
  }
}
